"""Table IO: parquet-backed catalog with an Iceberg-shaped API, plus the
transcripts reader and stable partition-bucket derivation."""

from .catalog import Catalog
from .snapshots import CommitConflict, IncrementalScanError, SnapshotTable
from .transcripts import (
    TRANSCRIPTS_SCHEMA,
    generate_transcripts,
    generate_expected,
    read_transcripts,
    with_partition_id,
)

__all__ = [
    "Catalog",
    "CommitConflict",
    "IncrementalScanError",
    "SnapshotTable",
    "TRANSCRIPTS_SCHEMA",
    "generate_transcripts",
    "generate_expected",
    "read_transcripts",
    "with_partition_id",
]
