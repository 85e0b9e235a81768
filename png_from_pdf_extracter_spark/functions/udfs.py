"""The sanctioned Python-boundary machinery, demonstrated against
value-exact oracles.

UDFs are the slow path — everything in ``functions/`` that CAN be a JVM
builtin IS one. But the brief's custom-operator ladder (builtins ->
pandas_udf / applyInPandas -> mapPartitions) needs the middle rungs
proven: these two implementations intentionally duplicate
builtin-expressible semantics so the DuckDB oracle can verify the Arrow
boundary value-for-value (same contract the extraction kernel relies on
at scale, where the logic genuinely cannot be a builtin).

- ``token_count_arrow``: scalar ``@pandas_udf`` — one Arrow batch in, one
  out; pandas str ops, zero per-row Python. Matches
  ``text.token_count`` exactly.
- ``zscore_per_group``: grouped-map ``applyInPandas`` — per-key
  normalization (feature-engineering shape). One shuffle on the key,
  whole group in memory per task — the documented constraint of the
  grouped-map path (a key's group must fit an executor; for skewed keys
  prefer window aggregates, which stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

from .text import TOKEN_PATTERN


# return type as a DataType INSTANCE, not a DDL string: string forms are
# parsed through the active session at decoration time, which would make
# this module un-importable before a SparkSession exists
@pandas_udf(LongType())
def token_count_arrow(texts):
    """Arrow-vectorized token count (BPE-ish regex, same pattern as the
    ``text.token_count`` builtin — the oracle twin verifies the Arrow
    path returns identical values)."""
    return texts.str.findall(TOKEN_PATTERN).str.len().fillna(0).astype("int64")


def zscore_per_group(
    df: DataFrame, key_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-key z-score normalization via grouped-map ``applyInPandas``:
    ``(x - mean) / stddev_samp`` rounded to 4, null when the group has no
    spread (n < 2 or constant values) — matching SQL window-aggregate
    semantics so DuckDB can value-check the grouped-map boundary."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} double"

    def norm(pdf):
        std = pdf[value_col].std(ddof=1)  # NaN for n<2
        mean = pdf[value_col].mean()
        if std and std == std and std > 0:  # not NaN, not zero
            z = ((pdf[value_col] - mean) / std).round(4)
        else:
            z = pdf[value_col] * float("nan")
        return pdf.assign(**{out_col: z})

    out = df.groupBy(key_col).applyInPandas(norm, schema)
    # pandas NaN crosses Arrow as double-NaN, not SQL NULL — normalize so
    # no-spread groups compare equal to the window-aggregate formulation
    return out.withColumn(
        out_col, F.when(~F.isnan(out_col), F.col(out_col))
    )


@pandas_udf(StringType())
def nfc_normalize(texts):
    """Arrow-vectorized Unicode NFC normalization (pandas ``str.normalize``
    — C-loop over the batch, no per-row Python). Spark has no NFC builtin,
    so this is the canonical 'small vectorized UDF where builtins end'
    example; DuckDB's ``nfc_normalize`` is the value-exact oracle twin.
    Training-data relevance: byte-level dedup is wrong when the same text
    arrives composed and decomposed — normalize first."""
    return texts.str.normalize("NFC")
