"""Pure-stdlib PNG codec (zlib + struct): the in-container REAL image
decode path for the multimodal pipeline.

The reference's media stage is a real transformation (ImageMagick PDF ->
PNG conversion + resize, ``/root/reference/src/services/pdf_converter.py:50-160``);
this container has no PIL/libvips, so without this module every in-container
run of ``decode_image`` exercised the deterministic fake. PNG's format is
fully specified (RFC 2083) and its baseline subset — 8-bit depth,
grayscale/RGB/RGBA, non-interlaced, the exact subset ``synth_media``
emits — decodes with nothing but ``zlib`` (IDAT inflate + CRC) and
``struct`` (chunk framing), so the decode stage can be REAL here:

- ``png_decode(data)`` -> ``(width, height, channels, pixels: bytearray)``
  parses the chunk stream, inflates the concatenated IDAT payload, and
  reverses the five scanline filters (None/Sub/Up/Average/Paeth).
- ``png_encode(width, height, channels, pixels)`` writes a minimal
  well-formed PNG (filter 0 scanlines, one IDAT) — used by the synthetic
  media generator so the fixtures are genuine decodable PNGs, and by
  tests to round-trip the decoder against known pixel values.

Scale note: these run INSIDE Arrow-batched ``mapInPandas`` workers — pure
CPU per payload, no driver state, no shuffle implications. On a cluster
with PIL/libvips installed the capability gate in ``multimodal`` prefers
the C decoder; this module is the guaranteed-available floor.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Malformed or unsupported-by-this-subset PNG payload."""


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise PngFormatError("bad PNG signature")
    off = 8
    n = len(data)
    while off + 8 <= n:
        (length,) = struct.unpack(">I", data[off:off + 4])
        ctype = data[off + 4:off + 8]
        body = data[off + 8:off + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk")
        crc_off = off + 8 + length
        if crc_off + 4 > n:
            raise PngFormatError("truncated chunk crc")
        (crc,) = struct.unpack(">I", data[crc_off:crc_off + 4])
        if crc != zlib.crc32(ctype + body) & 0xFFFFFFFF:
            raise PngFormatError(f"bad crc in {ctype!r}")
        yield ctype, body
        off = crc_off + 4
        if ctype == b"IEND":
            return
    raise PngFormatError("no IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes):
    """Decode a baseline PNG: 8-bit, color type 0/2/4/6, non-interlaced.
    Returns ``(width, height, channels, pixels)`` with ``pixels`` a
    row-major bytearray of ``width*height*channels`` samples. Raises
    ``PngFormatError`` on anything malformed or outside the subset —
    callers route that to the ``decode_failed`` error channel."""
    ihdr = None
    idat = bytearray()
    for ctype, body in _chunks(bytes(data)):
        if ctype == b"IHDR":
            if ihdr is not None:
                raise PngFormatError("duplicate IHDR")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise PngFormatError("missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise PngFormatError(f"unsupported bit depth {depth}")
    if color not in _CHANNELS:
        raise PngFormatError(f"unsupported color type {color}")
    if comp != 0 or filt != 0:
        raise PngFormatError("unsupported compression/filter method")
    if interlace != 0:
        raise PngFormatError("interlaced PNG not supported")
    if width <= 0 or height <= 0:
        raise PngFormatError("bad dimensions")
    channels = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise PngFormatError(f"IDAT inflate failed: {exc}") from exc
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngFormatError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        base = y * (stride + 1)
        f = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise PngFormatError(f"bad scanline filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, channels, out


def png_encode(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Minimal well-formed PNG writer: 8-bit, gray(1)/gray+alpha(2)/
    RGB(3)/RGBA(4) channels, filter-0 scanlines, one zlib IDAT."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match geometry")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride:(y + 1) * stride])
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def luma_grid_feature(
    width: int, height: int, channels: int, pixels: bytes, grid: int = 4
) -> list:
    """Decoded pixels -> ``grid x grid`` mean-luma feature (the stdlib
    twin of multimodal's PIL grayscale-thumbnail feature; integer-exact:
    ITU-R 601 luma in fixed point, box means floored — deterministic on
    every platform, so the values can be pinned by a frozen oracle)."""
    lum = bytearray(width * height)
    if channels == 1:
        lum[:] = pixels
    elif channels == 2:  # gray + alpha: alpha ignored for luma
        lum[:] = pixels[::2]
    else:
        step = channels  # 3 = RGB, 4 = RGBA (alpha ignored)
        for j in range(width * height):
            o = j * step
            lum[j] = (
                299 * pixels[o] + 587 * pixels[o + 1] + 114 * pixels[o + 2]
            ) // 1000
    feat = []
    for gy in range(grid):
        y0, y1 = gy * height // grid, (gy + 1) * height // grid
        for gx in range(grid):
            x0, x1 = gx * width // grid, (gx + 1) * width // grid
            npx = max(1, (y1 - y0) * (x1 - x0))
            s = 0
            for y in range(y0, y1):
                row = y * width
                for x in range(x0, x1):
                    s += lum[row + x]
            feat.append((s // npx) / 255.0)
    return feat
