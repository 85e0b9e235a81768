"""Per-partition lineage metrics — the ``ProcessingJob`` analog
(``/root/reference/src/models/processing_job.py:21-77``): one row per
processed bucket with counts, byte totals, content digest, version and
timing. This table IS the commit record the resume anti-join reads
(FIXTURES.md §4), the way the reference's IMAP delete-on-commit marks a
message "seen".

Digest design: FIXTURES.md sketches "md5 of ordered per-turn texts", which
needs a per-bucket ``collect_list`` — unbounded state at 10^12-turn scale
(a bucket may hold millions of turns). We use a commutative digest instead:
``sum(xxhash64(conv_id, turn_idx, extracted_text, status)) mod 2^64``.
Same integrity property (any changed/missing/extra row changes the digest,
modulo adversarial collisions we don't defend against), O(1) aggregation
state, map-side partial aggregation, no sort. The decimal(38,0) sum cannot
overflow below ~10^18 rows per bucket and is ANSI-safe.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("conv_id_min", T.StringType()),
        T.StructField("conv_id_max", T.StringType()),
        T.StructField("rows", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_class", T.StringType()),
        T.StructField("extractor_version", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("completed_at", T.TimestampType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

_TWO64 = "18446744073709551616"  # 2^64


def partition_metrics(
    written: DataFrame, extractor_version: str, started_at: _dt.datetime
) -> DataFrame:
    """Aggregate the written per-turn rows into one lineage row per bucket.
    Input needs columns: partition_id, conv_id, turn_idx, text_bytes,
    status, row_digest — column pruning keeps the read-back scan narrow."""
    digest = F.conv(
        F.pmod(
            F.sum(F.col("row_digest").cast(T.DecimalType(38, 0))),
            F.lit(_TWO64).cast(T.DecimalType(38, 0)),
        ).cast(T.DecimalType(20, 0)).cast("string"),
        10,
        16,
    )
    return (
        written.groupBy("partition_id")
        .agg(
            F.min("conv_id").alias("conv_id_min"),
            F.max("conv_id").alias("conv_id_max"),
            F.count("*").alias("rows"),
            F.sum("text_bytes").alias("bytes"),
            F.sum(F.when(F.col("status") == "error", 1).otherwise(0)).alias(
                "n_errors"
            ),
            digest.alias("digest"),
        )
        .select(
            "partition_id",
            "conv_id_min",
            "conv_id_max",
            "rows",
            "bytes",
            "n_errors",
            # the bucket commit status: per-row failures are classified data,
            # not bucket failures (error channel never poisons the pipeline)
            F.lit("ok").alias("status"),
            F.lit("").alias("error_class"),
            F.lit(extractor_version).alias("extractor_version"),
            "digest",
            F.lit(started_at).alias("started_at"),
            F.current_timestamp().alias("completed_at"),
            (
                F.unix_timestamp(F.current_timestamp())
                - F.lit(int(started_at.timestamp()))
            ).cast("double").alias("duration_s"),
        )
    )
