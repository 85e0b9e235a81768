"""Hypothesis fuzz for the stdlib PNG codec (functions/pngcodec.py) —
the one REAL media transformation in-container, so it gets the decoder
treatment: encode->decode roundtrip on arbitrary pixel buffers for
every supported color type, garbage and truncation must raise the typed
PngFormatError (the error-channel contract), never crash or return
wrong-shaped pixels.
"""

import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from png_from_pdf_extracter_spark.functions.pngcodec import (
    PngFormatError,
    png_decode,
    png_encode,
)

_settings = settings(
    max_examples=50, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@_settings
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    channels=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_roundtrip_any_pixels(w, h, channels, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * channels,
                max_size=w * h * channels,
            )
        )
    )
    out = png_decode(png_encode(w, h, channels, px))
    assert out == (w, h, channels, bytearray(px))


@_settings
@given(blob=st.binary(min_size=0, max_size=200))
def test_garbage_raises_typed_error_never_crashes(blob):
    try:
        png_decode(blob)
    except PngFormatError:
        pass  # the contract
    # zlib errors inside IDAT must not escape as untyped exceptions
    except zlib.error:
        raise AssertionError("zlib.error escaped the decoder")


@_settings
@given(cut=st.integers(1, 60))
def test_truncation_raises_typed_error(cut):
    full = png_encode(6, 5, 3, bytes(range(90)))
    truncated = full[: len(full) - cut]
    try:
        png_decode(truncated)
    except PngFormatError:
        pass
    except zlib.error:
        raise AssertionError("zlib.error escaped the decoder")
    else:
        # decoding a truncated container successfully is only legal if
        # the cut removed nothing the subset needs (trailing IEND bytes)
        assert cut <= 12


# ---- wavcodec (the audio sibling) ----


def test_wav_roundtrip_mono_and_stereo():
    from png_from_pdf_extracter_spark.functions.wavcodec import (
        wav_decode,
        wav_encode,
    )

    for ch in (1, 2):
        samples = [((t * 37) % 65536) - 32768 for t in range(60 * ch)]
        rate, got_ch, got = wav_decode(wav_encode(samples, 16000, ch))
        assert (rate, got_ch) == (16000, ch)
        assert got == samples


def test_wav_decode_rejects_garbage_and_truncation():
    import pytest

    from png_from_pdf_extracter_spark.functions.wavcodec import (
        wav_decode,
        wav_encode,
    )

    with pytest.raises(ValueError, match="bad_magic"):
        wav_decode(b"not a wav at all............")
    blob = wav_encode([1, -2, 3, -4], 8000, 1)
    with pytest.raises(ValueError):
        wav_decode(blob[:20])  # cut inside the fmt chunk
    with pytest.raises(ValueError):
        wav_decode(blob[:-3])  # cut inside the data chunk
    # RIFF/WAVE but no chunks at all
    with pytest.raises(ValueError, match="missing_chunk"):
        wav_decode(b"RIFF\x04\x00\x00\x00WAVE")


def test_wav_decode_rejects_non_pcm_and_odd_frames():
    import struct

    import pytest

    from png_from_pdf_extracter_spark.functions.wavcodec import (
        wav_decode,
        wav_encode,
    )

    blob = bytearray(wav_encode([0, 0], 8000, 1))
    # patch audio_format (offset: RIFF8 + WAVE4 + 'fmt '4 + len4 = 20)
    struct.pack_into("<H", blob, 20, 3)  # IEEE float
    with pytest.raises(ValueError, match="unsupported_format"):
        wav_decode(bytes(blob))
    with pytest.raises(ValueError, match="not a multiple"):
        wav_encode([1, 2, 3], 8000, 2)


def test_wav_decode_tolerates_extra_chunks():
    import struct

    from png_from_pdf_extracter_spark.functions.wavcodec import (
        wav_decode,
        wav_encode,
    )

    samples = [5, -5, 7, -7]
    blob = wav_encode(samples, 8000, 1)
    # splice a LIST chunk (odd length -> exercises the RIFF pad byte)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = blob[:12] + extra + blob[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8
    ) + spliced[8:]
    rate, ch, got = wav_decode(spliced)
    assert (rate, ch, got) == (8000, 1, samples)
