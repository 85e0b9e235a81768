"""Exact order statistics that percentile()/approx_percentile don't
cover: weighted quantiles. Pure integer plans (value ordering + BIGINT
cumulative weights), no floats anywhere — the strongest possible
cross-engine determinism class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: tuple[str, ...] = (),
    q_num: int = 1,
    q_den: int = 2,
) -> DataFrame:
    """Exact lower weighted q-quantile per group (default q=1/2, the
    weighted median): the smallest value whose cumulative weight reaches
    ``q`` of the group's total — "the doc length below which half the
    TOKENS sit" rather than half the docs, the question a token-budgeted
    corpus actually asks. The quantile is given as a RATIONAL
    ``q_num/q_den`` and the reach test is ``cumw * q_den >= total *
    q_num`` — integer weights in, zero float comparisons anywhere.

    Plan: one group-keyed window (ordered cumulative sum + full-frame
    total over the SAME exchange), one min-aggregate. Returns
    ``(group..., total_w, wq_value)``.
    """
    v = F.col(value_col)
    wt = F.col(weight_col).cast("long")
    win = Window.partitionBy(*group_cols).orderBy(
        v.asc(), wt.asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = Window.partitionBy(*group_cols)
    marked = df.select(
        *group_cols,
        v.alias("__v"),
        F.sum(wt).over(win).alias("__cumw"),
        F.sum(wt).over(full).alias("__total"),
    )
    reached = marked.filter(
        F.col("__cumw") * q_den >= F.col("__total") * q_num
    )
    return reached.groupBy(*group_cols).agg(
        F.max("__total").cast("long").alias("total_w"),
        F.min("__v").alias("wq_value"),
    )
