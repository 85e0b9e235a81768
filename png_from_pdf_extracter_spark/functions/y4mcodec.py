"""Pure-stdlib Y4M (YUV4MPEG2) codec — the video sibling of
``pngcodec``/``wavcodec``, completing the real in-container decode
story across all three modalities: Y4M is the standard UNCOMPRESSED
video interchange format (ffmpeg/mjpegtools), a plain-text header plus
raw frame planes, so a genuine video bitstream is parseable with zero
third-party deps (reference analog: the media transformation surface
of ``/root/reference/src/services/pdf_converter.py:50-160``).

Scope: ``Cmono`` (luma-only) streams — one ``width*height`` Y plane
per frame. Chroma colorspaces (C420 etc.) are recognized and rejected
with ``ValueError('unsupported_colorspace')`` — the honest capability
gate, same contract as the PNG codec's non-PNG magic handling.
Structural damage raises ``ValueError`` with a stable message class.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2"


def y4m_encode(
    width: int,
    height: int,
    frames: list[bytes],
    fps_num: int = 25,
    fps_den: int = 1,
) -> bytes:
    """Encode luma-only frames (each exactly ``width*height`` bytes)
    into a canonical YUV4MPEG2/Cmono byte stream."""
    if width < 1 or height < 1:
        raise ValueError("bad_geometry")
    out = bytearray(
        MAGIC
        + f" W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 Cmono".encode()
        + b"\n"
    )
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("bad_frame_size")
        out += b"FRAME\n" + fr
    return bytes(out)


def y4m_decode(data: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Decode a YUV4MPEG2/Cmono stream to ``(width, height, fps_num,
    fps_den, frames)`` with each frame the raw ``width*height`` luma
    plane. Raises ``ValueError`` with a stable class on bad magic,
    unsupported colorspace, malformed headers, or truncated frames."""
    if not data.startswith(MAGIC + b" ") and data[: len(MAGIC)] != MAGIC:
        raise ValueError("bad_magic")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("truncated_header")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "C420"  # the Y4M default when the tag is absent
    for tok in data[len(MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:]
        try:
            if tag == "W":
                width = int(val)
            elif tag == "H":
                height = int(val)
            elif tag == "F":
                fps_num, fps_den = (int(x) for x in val.split(b":"))
            elif tag == "C":
                colorspace = "C" + val.decode("ascii")
        except (ValueError, UnicodeDecodeError):
            raise ValueError("bad_header") from None
    if width is None or height is None or width < 1 or height < 1:
        raise ValueError("bad_header")
    if fps_num < 1 or fps_den < 1:
        raise ValueError("bad_header")
    if colorspace != "Cmono":
        raise ValueError("unsupported_colorspace")
    plane = width * height
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("bad_frame_marker")
        body = data[fnl + 1 : fnl + 1 + plane]
        if len(body) < plane:
            raise ValueError("truncated_frame")
        frames.append(bytes(body))
        pos = fnl + 1 + plane
    return width, height, fps_num, fps_den, frames
