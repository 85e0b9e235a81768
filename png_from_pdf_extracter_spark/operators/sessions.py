"""Gap-based sessionization over event/turn streams.

Transcripts and event logs arrive as flat rows; a "session" is a maximal run
of rows per key whose consecutive timestamps are within ``gap``. Classic
two-window plan (lag -> boundary flag -> running sum), all JVM builtins:

    lag(ts) over (key ORDER BY ts, tiebreak)    -- previous event time
    boundary = ts - prev > gap (or first row)
    session_idx = sum(boundary) over (key ORDER BY ...)  -- running count

One shuffle on the key; both windows share the same sort, so Catalyst plans
a single Exchange + Sort. The reference has no session concept (it is
per-message sequential), but its ordered-processing contract (FR-022,
``/root/reference/src/services/job_processor.py:75-77``) is what the
ORDER BY tie-break preserves here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Adds ``session_idx`` (1-based per key) and ``is_session_start``.
    Deterministic under ties via ``tiebreak_col`` (required if timestamps
    can repeat within a key)."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    boundary = (
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts))
           > gap_seconds)
    ).cast("int")
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("is_session_start", boundary).withColumn(
        "session_idx", F.sum("is_session_start").over(running).cast("int")
    )


def session_stats(sessions: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Per-session rollup: bounds, event count, duration."""
    return sessions.groupBy(key_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).cast("long").alias("duration_s"),
    )
