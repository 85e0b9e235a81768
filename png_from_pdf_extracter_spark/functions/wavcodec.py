"""Pure-stdlib WAV (RIFF/PCM) codec — the audio sibling of
``pngcodec``: real in-container decode with zero third-party deps, so
the audio leg of the multimodal pipeline is value-checkable instead of
a stub (the round-3 PNG move, applied to the next modality; reference
analog: binary payload handling in
``/root/reference/src/services/pdf_converter.py:50-160``).

Scope: canonical 16-bit little-endian integer PCM, the format every
recorder and resampler can emit. Chunk walking tolerates extra chunks
(LIST/fact) the way real files carry them; anything structurally broken
raises ``ValueError`` with a stable message class so the Spark layer
can bucket it into the standard error channel.
"""

from __future__ import annotations

import struct


def wav_encode(
    samples: list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Encode interleaved 16-bit PCM samples (Python ints in
    [-32768, 32767], frame-major interleaved when ``channels > 1``)
    into a canonical RIFF/WAVE byte string."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF/WAVE byte string to ``(sample_rate, channels,
    samples)`` with samples as interleaved Python ints. Only
    format-tag 1 (integer PCM) at 16 bits is in scope — anything else
    raises ``ValueError('unsupported_format')``; structural damage
    (bad magic, truncated chunks, missing fmt/data) raises
    ``ValueError`` with the matching message class."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("bad_magic")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated_chunk")
        if ctype == b"fmt ":
            if clen < 16:
                raise ValueError("truncated_chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            pcm = body
        # pad byte on odd chunk lengths, per RIFF
        pos += 8 + clen + (clen & 1)
    if fmt is None or pcm is None:
        raise ValueError("missing_chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("unsupported_format")
    if channels < 1 or rate < 1:
        raise ValueError("bad_header")
    n = len(pcm) // 2
    if len(pcm) % 2 or n % channels:
        raise ValueError("truncated_data")
    samples = list(struct.unpack(f"<{n}h", pcm))
    return rate, channels, samples
