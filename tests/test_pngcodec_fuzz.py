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
