"""Skew handling: salted repartition ahead of the extraction UDF stage.

The reference is sequential so skew is moot (SURVEY.md §4); at 10^12 turns a
hot conversation would pin one task for hours. AQE's skew-join splitting does
not apply to a Python map stage, so we salt explicitly: distribute rows by
``(partition_id, xxhash64(conv_id, turn_idx) % salt_buckets)`` so one hot
conversation fans out over ``salt_buckets`` tasks. Extraction is per-row
stateless, so no unsalt step is needed — downstream reassembly shuffles by
``(conv_id, turn_idx)`` anyway.

``salted_repartition_auto`` adds the measure-first variant: the shuffle is
the single biggest data movement in the pipeline (every payload byte), so
when a cheap sample shows no conversation exceeds a task's worth of rows
AND the source splits are already balanced, skipping it is a pure win —
the scan's natural parallelism feeds mapInPandas directly. At 100 TB the
sample is a driver-side decision costing one tiny job over ~2% of splits.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame, num_partitions: int, salt_buckets: int = 8
) -> DataFrame:
    salt = F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx")), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.col("partition_id"), salt)


def max_key_share(
    df: DataFrame,
    key_col: str = "conv_id",
    sample_fraction: float = 0.02,
    seed: int = 42,
) -> float:
    """Fraction of (sampled) rows held by the hottest key — the skew
    statistic the auto mode decides on. One small job at plan time."""
    agg = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(key_col)
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
        .first()
    )
    if not agg or not agg["tot"]:
        return 0.0
    return float(agg["mx"]) / float(agg["tot"])


def salted_repartition_auto(
    df: DataFrame,
    num_partitions: int,
    salt_buckets: int = 8,
    key_col: str = "conv_id",
    hot_share_threshold: Optional[float] = None,
    sample_fraction: float = 0.02,
) -> DataFrame:
    """Shuffle only when measured skew warrants it.

    Default threshold: ``1 / num_partitions`` — if the hottest conversation
    holds more than one task's fair share of rows, a task would straggle
    and we salt; otherwise the scan's own splits are good enough and the
    full-payload shuffle is skipped entirely.
    """
    threshold = (
        hot_share_threshold
        if hot_share_threshold is not None
        else 1.0 / max(num_partitions, 1)
    )
    share = max_key_share(df, key_col, sample_fraction)
    if share > threshold:
        return salted_repartition(df, num_partitions, salt_buckets)
    return df
