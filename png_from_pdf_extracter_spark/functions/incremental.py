"""Incremental aggregate maintenance: mergeable partial profiles.

At 10^12-turn scale you never re-aggregate the corpus when a new batch
lands; you keep a stored PARTIAL state per group — (n, sum, sum-of-
squares, min, max) — aggregate only the delta, and merge states with
plain arithmetic. count/sum/sumsq/min/max are all commutative monoids, so
merge(partial(A), partial(B)) == partial(A ∪ B) exactly (integer/min/max)
or up to float summation order (sums). The same contract powers Spark's
own map-side partial aggregation; this module lifts it to the
TABLE level so a metrics/profile table can be maintained across job runs
(the extract_metrics lineage table uses the same append-then-rollup
pattern, plans/metrics.py).

Finalized moments derive from the state: mean = s/n,
sample std = sqrt((ss - s^2/n) / (n-1)). HLL sketches and approx
percentiles extend the same way (mergeable sketches, see
q_profile_sketch); here we keep the exact-arithmetic core so the oracle
can verify the merge law to the digit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n", "s", "ss", "mn", "mx")


def partial_profile(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One mergeable state row per group: (group, n, s, ss, mn, mx).
    A single map-side-combinable aggregation over the batch — the only
    corpus-touching pass in the incremental scheme."""
    v = F.col(value_col)
    return df.groupBy(group_col).agg(
        F.count(v).cast("long").alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("ss"),
        F.min(v).cast("double").alias("mn"),
        F.max(v).cast("double").alias("mx"),
    )


def merge_profiles(group_col: str, *states: DataFrame) -> DataFrame:
    """Merge any number of partial-state tables into one. Runs on the
    post-aggregation tables (rows = number of groups, not corpus size),
    so the union + groupBy here is a metadata-sized shuffle."""
    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(group_col).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finalize_profile(state: DataFrame, group_col: str) -> DataFrame:
    """Derive the human-facing moments from the state: (group, n, mean,
    std, mn, mx). Sample std via the sums-of-squares identity; null when
    n < 2 (no spread defined)."""
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    var = (ss - s * s / n) / (n - F.lit(1))
    std = F.when(n >= 2, F.sqrt(F.greatest(var, F.lit(0.0))))
    return state.select(
        group_col,
        "n",
        F.round(s / n, 4).alias("mean"),
        F.round(std, 4).alias("std"),
        F.round("mn", 4).alias("mn"),
        F.round("mx", 4).alias("mx"),
    )
