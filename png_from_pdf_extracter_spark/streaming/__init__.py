from .extract_stream import (
    stream_extract,
    stream_extract_to_catalog,
    stream_extract_to_snapshots,
    stream_interval_join,
    stream_static_enrich,
    stream_turn_rates,
    stream_conv_progress,
    stream_dedup,
    stream_sessionize,
    stream_profile_to_catalog,
    read_profile,
    stream_drift_monitor,
    stream_upsert_to_snapshots,
)
from .stateful import (
    conversation_progress_stateful,
    conversation_progress_tws,
    tws_available,
)

__all__ = [
    "stream_extract",
    "stream_extract_to_catalog",
    "stream_extract_to_snapshots",
    "stream_interval_join",
    "stream_static_enrich",
    "stream_turn_rates",
    "stream_conv_progress",
    "stream_dedup",
    "stream_sessionize",
    "stream_profile_to_catalog",
    "read_profile",
    "stream_drift_monitor",
    "stream_upsert_to_snapshots",
    "conversation_progress_stateful",
    "conversation_progress_tws",
    "tws_available",
]
