"""The flagship DataFrame plan (scan -> resume anti-join -> whitelist filter ->
salted repartition -> mapInPandas extraction -> ordered outputs) plus the
per-partition lineage/metrics aggregation."""

from .extract_plan import JobParams, extract_turns, run_job, EXTRACTED_SCHEMA
from .metrics import partition_metrics, METRICS_SCHEMA

__all__ = [
    "JobParams",
    "extract_turns",
    "run_job",
    "EXTRACTED_SCHEMA",
    "partition_metrics",
    "METRICS_SCHEMA",
]
