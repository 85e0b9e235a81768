"""Skew handling: salted repartition ahead of the extraction UDF stage.

The reference is sequential so skew is moot (SURVEY.md §4); at 10^12 turns a
hot conversation would pin one task for hours. AQE's skew-join splitting does
not apply to a Python map stage, so we salt explicitly: distribute rows by
``(partition_id, xxhash64(conv_id, turn_idx) % salt_buckets)`` so one hot
conversation fans out over ``salt_buckets`` tasks. Extraction is per-row
stateless, so no unsalt step is needed — downstream reassembly shuffles by
``(conv_id, turn_idx)`` anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame, num_partitions: int, salt_buckets: int = 8
) -> DataFrame:
    salt = F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx")), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.col("partition_id"), salt)
