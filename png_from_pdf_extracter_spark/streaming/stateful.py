"""Custom stateful streaming operator: per-conversation running progress.

``stream_conv_progress`` (extract_stream.py) is a plain watermarked
aggregation — Spark manages its state. This module is the
``applyInPandasWithState`` path for semantics builtins can't express: an
explicit per-key state machine, updated per micro-batch, persisted in the
checkpoint, surviving restarts. It is the streaming twin of the
``ProcessingJob`` record (ref ``/root/reference/src/models/
processing_job.py:21-77``): one evolving row per conversation with
cumulative counts — the PENDING -> PROCESSING -> COMPLETED/FAILED state
machine generalized to a running tally (a conversation never "ends" in an
unbounded stream; callers read the latest row per key).

State is a fixed-width struct (counts only, no unbounded text) so state
size is O(active conversations), not O(turns) — the constraint that matters
at 10^12 turns.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)


def _update(
    key: Tuple[Any, ...], pdfs: Iterator, state: GroupState
) -> Iterator:
    import pandas as pd

    (conv_id,) = key
    if state.exists:
        n_turns, n_errors, total_chars, max_turn = state.get
    else:
        n_turns, n_errors, total_chars, max_turn = 0, 0, 0, -1
    for pdf in pdfs:
        n_turns += len(pdf)
        n_errors += int((pdf["status"] == "error").sum())
        total_chars += int(pdf["extracted_text"].str.len().fillna(0).sum())
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_errors, total_chars, max_turn))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_errors": [n_errors],
            "total_chars": [total_chars],
            "max_turn_idx": [max_turn],
        }
    )


def conversation_progress_stateful(extracted: DataFrame) -> DataFrame:
    """Streaming extracted-turns -> one cumulative progress row per
    conversation per micro-batch (update mode). State lives in the
    checkpoint: a restarted query continues the tallies, it does not reset
    them — the property the test suite pins."""
    return extracted.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """Spark 4's ``transformWithStateInPandas`` needs ``google.protobuf``
    in the Python workers (the typed-state server protocol); this
    container does not ship it, so the TWS path is capability-gated the
    same way the PIL image decoder is: real when the dependency exists,
    a clear error otherwise."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def conversation_progress_tws(extracted: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    ``conversation_progress_stateful`` — the Spark 4 successor API with
    typed per-key state (ValueState here; ListState/MapState/TTL/timers
    are the features the legacy API lacks). Semantically identical to the
    legacy operator so the parity test can pin one against the other when
    the dependency is present. Requires the RocksDB state store provider
    (set by the caller's session conf) and ``google.protobuf`` in the
    workers."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python workers; not available in this environment "
            "(capability-gated, see tws_available)"
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _ConvProgress(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("progress", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n_turns, n_errors, total_chars, max_turn = self._state.get()
            else:
                n_turns, n_errors, total_chars, max_turn = 0, 0, 0, -1
            for pdf in rows:
                n_turns += len(pdf)
                n_errors += int((pdf["status"] == "error").sum())
                total_chars += int(
                    pdf["extracted_text"].str.len().fillna(0).sum()
                )
                if len(pdf):
                    max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            self._state.update((n_turns, n_errors, total_chars, max_turn))
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n_turns],
                    "n_errors": [n_errors],
                    "total_chars": [total_chars],
                    "max_turn_idx": [max_turn],
                }
            )

        def close(self) -> None:
            pass

    return extracted.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=_ConvProgress(),
        outputStructType=PROGRESS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
