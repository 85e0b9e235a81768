"""Distribution-drift detection between two corpus snapshots: PSI.

The Population Stability Index is the standard production gate for
"did this week's ingest change the data distribution" — per group:
bucket the metric by the BASE snapshot's quantile edges, compare the
two snapshots' bucket shares p_b / p_c, and sum
``(p_c - p_b) * ln(p_c / p_b)``. Common reading: < 0.1 stable,
0.1-0.25 drifting, > 0.25 shifted.

Scale design: the only per-row work is one broadcast join against the
(groups x 1) edge-array table and a map-side bucket assignment
(``size(filter(edges, e -> x > e))`` — a JVM higher-order function, no
UDF); everything after operates on (groups x buckets) rows. Bucket
counts are map-combinable; the base-side quantile computation is the
same exact interpolated ``percentile`` the winsorize/profile operators
already pin against DuckDB's ``quantile_cont``. Laplace smoothing
((n + 0.5) / (N + 0.5k)) keeps empty buckets finite and is integer-
derived, so another engine reproduces the value bit-for-bit after
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_drift(
    base: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """PSI of ``value_col`` between ``base`` and ``cur``, per
    ``group_col``. Returns (group, n_base, n_cur, psi) with psi rounded
    to 5. Groups must appear in both snapshots (inner join on the edge
    table; a group absent from base has no reference distribution)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # edges rounded to 4dp: interpolated quantiles can differ by 1 ulp
    # across engines, and a data value sitting exactly on an edge would
    # then flip buckets — rounding pins the boundary (the same rounded
    # percentile equality the winsorize oracle relies on)
    edges = base.groupBy(group_col).agg(
        F.transform(
            F.percentile(value_col, qs), lambda e: F.round(e, 4)
        ).alias("edges")
    )

    def buckets(df: DataFrame, out: str) -> DataFrame:
        b = (
            F.size(
                F.filter("edges", lambda e: F.col(value_col) > e)
            )
            + 1
        )
        return (
            df.join(F.broadcast(edges), group_col)
            .select(group_col, b.alias("bucket"))
            .groupBy(group_col, "bucket")
            .agg(F.count("*").alias(out))
        )

    bc = buckets(base, "n_b").join(
        buckets(cur, "n_c"), [group_col, "bucket"], "full_outer"
    ).select(
        group_col,
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.coalesce("n_c", F.lit(0)).alias("n_c"),
    )
    k = float(n_buckets)
    tot = bc.groupBy(group_col).agg(
        F.sum("n_b").alias("tb"), F.sum("n_c").alias("tc")
    )
    p_b = (F.col("n_b") + 0.5) / (F.col("tb") + 0.5 * k)
    p_c = (F.col("n_c") + 0.5) / (F.col("tc") + 0.5 * k)
    term = (p_c - p_b) * F.log(p_c / p_b)
    return (
        bc.join(F.broadcast(tot), group_col)
        .groupBy(group_col)
        .agg(
            F.min("tb").alias("n_base"),
            F.min("tc").alias("n_cur"),
            F.round(F.sum(term), 5).alias("psi"),
        )
    )
