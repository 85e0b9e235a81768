from .extract_stream import (
    stream_extract,
    stream_turn_rates,
    stream_conv_progress,
)

__all__ = ["stream_extract", "stream_turn_rates", "stream_conv_progress"]
