"""Resume: anti-join against completed partitions in the lineage table.

The reference's incremental scan is "UNSEEN only" + delete-on-commit
(``/root/reference/src/services/imap_service.py:136-210, 212-235``): work that
was committed never reappears; work that failed stays in the source and is
retried (at-least-once, spec NFR-008). Spark mapping: a partition bucket is
"seen" iff ``extract_metrics`` holds a ``status='ok'`` row for it under the
current extractor version; pending work = transcripts anti-joined against
that set. The completed set is tiny (one row per bucket) — Spark broadcasts
the anti-join side automatically, so resume costs no shuffle on the big table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def completed_partitions(metrics: DataFrame, extractor_version: str) -> DataFrame:
    """Distinct partition_ids recorded complete for this extractor version.
    A version bump invalidates prior lineage (full re-extract), mirroring the
    reference's reprocess-on-change semantics."""
    return (
        metrics.filter(
            (F.col("status") == "ok")
            & (F.col("extractor_version") == extractor_version)
        )
        .select("partition_id")
        .distinct()
    )


def pending_only(transcripts: DataFrame, completed: DataFrame) -> DataFrame:
    """Keep only rows of partitions not yet committed. Broadcast anti-join:
    the completed set is bounded by n_buckets (thousands at most)."""
    return transcripts.join(
        F.broadcast(completed), on="partition_id", how="left_anti"
    )
