"""Error channel: split extracted rows into ok/quarantine streams.

The reference never poisons the pipeline on a bad item: failures become a
classified error + notification and the daemon continues
(``/root/reference/src/services/job_processor.py:155-179``). Here failures
are rows with ``status='error'`` routed to an ``extract_errors`` table with
the error class and a truncated payload head for debugging (the error-email
context dict analog, ``smtp_service.py:154-218``). No task ever aborts on a
bad payload — classification is total in the kernel.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_quarantine(extracted: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """Returns ``(good, quarantined)``. Good rows keep every status that is
    not a hard error (ok / empty / no_payload all produce an output row, per
    FIXTURES.md §2 'row still emitted')."""
    is_err = F.col("status") == "error"
    good = extracted.filter(~is_err)
    quarantined = extracted.filter(is_err).select(
        "conv_id",
        "turn_idx",
        "partition_id",
        "error_class",
        F.col("text_head"),
        F.col("text_bytes"),
    )
    return good, quarantined
