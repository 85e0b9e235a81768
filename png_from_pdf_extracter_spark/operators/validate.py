"""Row validation as a relational operator — the reference's dataclass
CHECK constraints (``__post_init__`` rules: sender must contain '@',
uid > 0, payload non-empty/bounded; ``/root/reference/src/models/
email_message.py:27-34``, ``pdf_attachment.py:24-33``) re-expressed as a
single ``when``-chain over the transcripts schema. Rows are never
rejected by raising: each gets the FIRST violated rule as its
``violation`` (null = valid), so bad input flows to the quarantine sink
instead of aborting tasks (SURVEY.md §2.2 'validation predicates')."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_ROLES = ("user", "assistant", "system", "tool")

# (rule name, violation predicate) — order defines reporting precedence,
# mirroring the reference's field-by-field __post_init__ ordering
_RULES: list[tuple[str, Column]] = []


def _rules(max_text_bytes: int) -> list[tuple[str, Column]]:
    return [
        ("conv_id_empty", F.col("conv_id").isNull() | (F.length("conv_id") == 0)),
        ("turn_idx_negative", F.col("turn_idx").isNull() | (F.col("turn_idx") < 0)),
        ("role_invalid", F.col("role").isNull() | ~F.col("role").isin(*VALID_ROLES)),
        ("text_null", F.col("text").isNull()),
        (
            "text_oversized",
            F.octet_length("text") > F.lit(max_text_bytes),
        ),
        ("ts_null", F.col("ts").isNull()),
    ]


def validate_rows(
    df: DataFrame, max_text_bytes: int = 100 * 1024 * 1024
) -> DataFrame:
    """Adds ``violation`` (first failed rule, null if valid). The 100 MB
    default bound mirrors the reference's payload cap
    (``pdf_attachment.py:30``)."""
    expr = F.lit(None).cast("string")
    for name, pred in reversed(_rules(max_text_bytes)):
        expr = F.when(pred, F.lit(name)).otherwise(expr)
    return df.withColumn("violation", expr)


def split_valid(
    df: DataFrame, max_text_bytes: int = 100 * 1024 * 1024
) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, quarantined_rows) — quarantined keep their
    ``violation`` label for the dead-letter table."""
    v = validate_rows(df, max_text_bytes)
    return (
        v.filter(F.col("violation").isNull()).drop("violation"),
        v.filter(F.col("violation").isNotNull()),
    )
