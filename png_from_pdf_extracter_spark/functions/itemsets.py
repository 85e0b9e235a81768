"""Association-rule mining over basket-shaped data: pairwise item
co-occurrence with support / confidence / lift. The classic
market-basket primitive ("brands ordered together"), and for training
corpora the co-occurrence backbone (tags per document, tools per
conversation). Relational formulation only — distinct + self-join +
groupBy — no driver state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cooccur_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket_items: int = 10_000,
) -> DataFrame:
    """Pairwise co-occurrence statistics over (basket, item) rows:
    for every unordered item pair ``(a < b)`` seen in at least
    ``min_pair_count`` baskets, emit basket counts and the exact
    support / confidence(a->b) / lift ratios.

    Exactness: all counts are BIGINT; ``lift = N * n_ab / (n_a * n_b)``
    has an exact DECIMAL(38,0) numerator/denominator and every emitted
    ratio is ONE final floor-6dp float expression (ppm columns) — the
    cross-engine-stable emit convention.

    Plan shape (the 100-TB story): baskets are first collapsed to
    DISTINCT (basket, item) — one map-combinable shuffle on the basket
    key — and the pair generation is a self-equi-join on that SAME key,
    so per-basket work is O(k^2) with k the basket's item count, never
    corpus-global. A pathological basket (one key holding a meaningful
    fraction of all items) would make that quadratic blow up on a
    single task, so baskets larger than ``max_basket_items`` distinct
    items are DROPPED before the join (the standard cap in production
    frequent-itemset mining); ``n_baskets`` counts only surviving
    baskets, keeping support/lift consistent with the mined universe.
    The scalar totals table is a single row — broadcast crossJoin, the
    house pattern for global denominators.
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    if max_basket_items < 2:
        raise ValueError("max_basket_items must be >= 2")
    b = (
        df.select(
            F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
        )
        .filter(F.col("__it").isNotNull() & F.col("__bk").isNotNull())
        .distinct()
    )
    sized = b.withColumn(
        "__k", F.count("*").over(Window.partitionBy("__bk"))
    ).filter(F.col("__k") <= max_basket_items).drop("__k")
    n_baskets = F.broadcast(
        sized.agg(
            F.count_distinct("__bk").cast("long").alias("n_baskets")
        )
    )
    singles = sized.groupBy("__it").agg(
        F.count("*").cast("long").alias("__n1")
    )
    x, y = sized.alias("x"), sized.alias("y")
    pair_counts = (
        x.join(
            y,
            (F.col("x.__bk") == F.col("y.__bk"))
            & (F.col("x.__it") < F.col("y.__it")),
        )
        .groupBy(
            F.col("x.__it").alias("item_a"),
            F.col("y.__it").alias("item_b"),
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    dec = "decimal(38,0)"
    joined = (
        pair_counts.join(
            singles.select(
                F.col("__it").alias("item_a"), F.col("__n1").alias("n_a")
            ),
            "item_a",
        )
        .join(
            singles.select(
                F.col("__it").alias("item_b"), F.col("__n1").alias("n_b")
            ),
            "item_b",
        )
        .crossJoin(n_baskets)
    )
    return joined.select(
        "item_a",
        "item_b",
        "n_ab",
        "n_a",
        "n_b",
        "n_baskets",
        F.floor(
            F.col("n_ab").cast("double")
            / F.col("n_baskets").cast("double")
            * F.lit(1e6)
        ).cast("long").alias("support_ppm"),
        F.floor(
            F.col("n_ab").cast("double")
            / F.col("n_a").cast("double")
            * F.lit(1e6)
        ).cast("long").alias("confidence_ppm"),
        F.floor(
            (F.col("n_baskets").cast(dec) * F.col("n_ab").cast(dec))
            .cast("double")
            / (F.col("n_a").cast(dec) * F.col("n_b").cast(dec))
            .cast("double")
            * F.lit(1e6)
        ).cast("long").alias("lift_ppm"),
    )
