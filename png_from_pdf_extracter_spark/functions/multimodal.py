"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` transforms.

The image decode kernel is CAPABILITY-GATED with a guaranteed floor: when
PIL is installed (``HAVE_PIL``) ``decode_image`` uses it; for PNG payloads
a pure-stdlib decoder (``pngcodec`` — zlib inflate + scanline unfilter) is
ALWAYS available, so the decode stage is REAL in this container too
(grayscale 4x4 luma grid -> 16 intensities); only non-PNG formats without
PIL raise ``NotImplementedError``. ``fake=True`` forces the clearly-marked
deterministic fake (seeded by the payload's md5) for plumbing tests. All
paths share the schema and error-channel contract. ``synth_media`` emits
genuine decodable PNGs for its image rows, so the in-container pipeline
exercises real decode end-to-end (``q_media_decode`` value-checks it
against a frozen golden). Audio rows carry genuine 16-bit PCM WAVs
decoded for real by the pure-stdlib [[wavcodec]] (``audio_stats``) and
video rows genuine Y4M bitstreams decoded by [[y4mcodec]]
(``video_stats``; ``sample_frames`` emits REAL PNG-encoded frames for
Y4M payloads and falls back to the deterministic stub for compressed
formats this container cannot decode) — all three modalities run real
decode in-container since r4.
"""

from __future__ import annotations

import hashlib
import io
from typing import Iterator

try:  # capability gate: real decoder when the cluster has PIL
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:  # this container: deterministic fake only
    _PILImage = None
    HAVE_PIL = False

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .pngcodec import (
    PngFormatError,
    luma_grid_feature,
    png_decode,
    png_encode,
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("status", T.StringType()),
        T.StructField("error_class", T.StringType()),
    ]
)

FEATURE_DIM = 16


def _fake_feature(payload: bytes) -> list:
    """Deterministic fake feature vector: 16 floats derived from md5 bytes.
    Clearly NOT a real decoder — stands in for decode+embed so the
    distributed plumbing is exercisable and testable."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def _pil_feature(payload: bytes) -> list:
    """Real decode path (used when PIL is installed): decode -> grayscale
    -> 4x4 thumbnail -> 16 normalized pixel intensities. Same FEATURE_DIM
    and value range as the fake, so downstream schema/contract is
    identical on clusters with and without the decoder."""
    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    return [p / 255.0 for p in img.getdata()]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Non-PNG formats we can *recognize* but not decode without PIL. A payload
# bearing one of these magics is a capability gap (decoder_unavailable);
# bytes matching none of the known image magics are corrupt (decode_failed).
_KNOWN_IMAGE_MAGICS = (
    b"\xff\xd8\xff",  # JPEG
    b"GIF87a",
    b"GIF89a",
    b"BM",  # BMP
    b"RIFF",  # WEBP container
    b"II*\x00",  # TIFF little-endian
    b"MM\x00*",  # TIFF big-endian
)


def _stdlib_png_feature(payload: bytes) -> list:
    """Real decode via the pure-stdlib PNG codec: inflate + unfilter, then
    the 4x4 mean-luma grid (the stdlib twin of the PIL thumbnail path;
    integer-exact, so values are frozen-golden checkable)."""
    return luma_grid_feature(*png_decode(payload))


def decode_image(payload: bytes, fake: bool = False) -> list:
    """Image -> FEATURE_DIM floats. ``fake=True`` forces the deterministic
    stand-in. Real path preference: PIL when installed (any format), else
    the pure-stdlib PNG decoder (always available — PNG payloads decode
    for real in this container); non-PNG without PIL raises
    ``NotImplementedError``. Decode failures on real payloads raise
    (``PngFormatError``/PIL errors) — callers classify them into the
    error channel, never fail the task."""
    if fake:
        return _fake_feature(payload)
    if HAVE_PIL:
        return _pil_feature(payload)
    head = bytes(payload[:16])
    if head[:8] == _PNG_SIG:
        return _stdlib_png_feature(payload)
    if any(head.startswith(m) for m in _KNOWN_IMAGE_MAGICS):
        raise NotImplementedError(
            "non-PNG image decoding requires PIL/libvips — not available "
            "in this container; PNG decodes via the stdlib codec, or pass "
            "fake=True for the deterministic stand-in"
        )
    # No recognizable image magic at all: corrupt, not a capability gap.
    raise PngFormatError("payload matches no known image signature")


def extract_media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Error-channel
    semantics match the text pipeline: classification, never task failure."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, statuses, errors, digests, nbytes = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                nbytes.append(len(b))
                if not b:
                    feats.append(None)
                    statuses.append("no_payload")
                    errors.append("")
                    digests.append("")
                    continue
                try:
                    feats.append(decode_image(b, fake=fake))
                    statuses.append("ok")
                    errors.append("")
                except NotImplementedError:
                    feats.append(None)
                    statuses.append("error")
                    errors.append("decoder_unavailable")
                except Exception:  # corrupt/unsupported payload via PIL
                    feats.append(None)
                    statuses.append("error")
                    errors.append("decode_failed")
                digests.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "digest": digests,
                    "feature": feats,
                    "status": statuses,
                    "error_class": errors,
                }
            )

    return df.mapInPandas(fn, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_class", T.StringType()),
    ]
)


def _png_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for PNG payloads (the in-container analog of the
    reference's ``-resize 1920x1080!`` forced-geometry ImageMagick step,
    ``pdf_converter.py:74-89``): stdlib decode -> nearest-neighbor
    resample to exactly (width, height) -> stdlib re-encode. Nearest is
    the minimal deterministic resampler — geometry is forced, like the
    reference's ``!`` flag."""
    w, h, c, px = png_decode(payload)
    out = bytearray(width * height * c)
    for y in range(height):
        sy = y * h // height
        src_row = sy * w * c
        dst_row = y * width * c
        for x in range(width):
            sx = x * w // width
            so = src_row + sx * c
            do = dst_row + x * c
            out[do:do + c] = px[so:so + c]
    return png_encode(width, height, c, bytes(out))


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for non-PNG payloads without PIL: output
    bytes are a digest-stream of (payload, target geometry), length
    proportional to the target pixel count. The Spark-side contract
    (bytes in, bytes out, fixed geometry metadata) is what this pins."""
    n_out = max(16, (width * height) // 64)
    seed = hashlib.md5(payload + f":{width}x{height}".encode()).digest()
    out = bytearray()
    block = seed
    while len(out) < n_out:
        block = hashlib.md5(block).digest()
        out.extend(block)
    return bytes(out[:n_out])


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas image resize (the analog of the reference's
    ``-resize 1920x1080!`` ImageMagick step, ``pdf_converter.py:74-89``,
    with the subprocess swapped for an in-process kernel). PNG payloads
    resize FOR REAL (stdlib decode -> resample -> re-encode); non-PNG
    images fall back to the deterministic stand-in. Non-image rows pass
    through the error channel (``status='skipped'``), never fail the
    task."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            outs, statuses, errors = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if kind != "image":
                    outs.append(None)
                    statuses.append("skipped")
                    errors.append("not_an_image")
                elif not b:
                    outs.append(None)
                    statuses.append("no_payload")
                    errors.append("")
                else:
                    if b[:8] == _PNG_SIG:
                        try:
                            outs.append(
                                bytearray(_png_resize(b, width, height))
                            )
                            statuses.append("ok")
                            errors.append("")
                        except PngFormatError:
                            outs.append(None)
                            statuses.append("error")
                            errors.append("decode_failed")
                    else:
                        outs.append(
                            bytearray(_fake_resize(b, width, height))
                        )
                        statuses.append("ok")
                        errors.append("")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": outs,
                    "out_width": pd.Series(
                        [width] * len(pdf), dtype="int32"
                    ),
                    "out_height": pd.Series(
                        [height] * len(pdf), dtype="int32"
                    ),
                    "status": statuses,
                    "error_class": errors,
                }
            )

    return df.mapInPandas(fn, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 100
) -> DataFrame:
    """mapInPandas frame sampling: one video row fans out to one row per
    sampled frame (1-indexed, like the reference's per-page PNG ordinals,
    ``pdf_converter.py:141-158``), bounded by ``max_frames`` (the
    timeout/cap analog). Y4M payloads decode FOR REAL ([[y4mcodec]]):
    the sampled timestamp maps to its 25-fps frame and the luma plane is
    re-encoded as a genuine grayscale PNG — decode in, decode out, both
    stdlib. Compressed formats this container cannot decode keep the
    deterministic 16-byte md5 stub (the documented capability gate).
    Non-video rows produce no frames; the per-video row count is
    ``min(dur // every_ms + 1, max_frames)`` on both paths."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from .y4mcodec import MAGIC as _Y4M_MAGIC
        from .y4mcodec import y4m_decode

        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["meta_duration_ms"],
            ):
                if kind != "video" or payload is None or dur is None:
                    continue
                b = bytes(payload)
                n = min(int(dur) // every_ms + 1, max_frames)
                frames = None
                if b.startswith(_Y4M_MAGIC):
                    try:
                        w, h, fn_, fd_, frames = y4m_decode(b)
                        ms_per_frame = 1000 * fd_ // fn_
                    except ValueError:
                        frames = None  # corrupt: fall back to the stub
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i + 1)
                    tss.append(i * every_ms)
                    if frames:
                        fidx = min(
                            (i * every_ms) // max(ms_per_frame, 1),
                            len(frames) - 1,
                        )
                        payloads.append(
                            bytearray(png_encode(w, h, 1, frames[fidx]))
                        )
                        continue
                    payloads.append(
                        bytearray(
                            hashlib.md5(b + f":frame:{i}".encode()).digest()
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int32"),
                    "frame_payload": payloads,
                }
            )

    return df.mapInPandas(fn, FRAMES_SCHEMA)


def _synth_png(i: int) -> tuple:
    """Deterministic genuine PNG for media row ``i``: small RGB/gray
    gradient whose pixels are a pure function of (i, x, y) — decodable by
    the stdlib codec AND by any real decoder, so the decode stage is
    exercised for real in-container. Returns (payload, width, height)."""
    w = 8 + (i % 5) * 4
    h = 8 + (i % 3) * 4
    channels = 1 if i % 4 == 0 else 3
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if channels == 1:
                px.append((x * 13 + y * 7 + i * 29) % 256)
            else:
                px.append((x * 11 + i * 17) % 256)
                px.append((y * 19 + i * 5) % 256)
                px.append((x + y + i) % 256)
    return png_encode(w, h, channels, bytes(px)), w, h


def _synth_wav(i: int) -> tuple:
    """Deterministic genuine WAV for media row ``i``: 16-bit PCM whose
    interleaved samples are a pure function of (i, t) — decodable by
    the stdlib codec AND by any real WAV reader, and closed-form
    recomputable in SQL (the ``_synth_png`` move for the audio leg).
    Returns (payload, sample_rate, channels, n_total_samples)."""
    from .wavcodec import wav_encode

    channels = 1 + (i % 2)
    rate = 8000 * (1 + (i % 3))
    n_total = (120 + (i * 17) % 180) * channels
    samples = [
        ((i * 131 + t * 31 + (t * t) % 97) % 65536) - 32768
        for t in range(n_total)
    ]
    return wav_encode(samples, rate, channels), rate, channels, n_total


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table. Image rows carry GENUINE PNG
    payloads (stdlib-encoded gradients; meta geometry = true geometry)
    and audio rows GENUINE 16-bit PCM WAV payloads (stdlib-encoded
    integer waveforms) — both decodes run for real in-container; video
    payloads remain seeded opaque bytes (their frame decode is the
    documented stub)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            payload, w, h = _synth_png(i)
            rows.append(
                (i, kind, "image/png", bytearray(payload), w, h, None)
            )
            continue
        if kind == "audio":
            payload, rate, ch, n_total = _synth_wav(i)
            dur_ms = (n_total // ch) * 1000 // rate
            rows.append(
                (i, kind, "audio/wav", bytearray(payload), None, None,
                 dur_ms)
            )
            continue
        payload, w, h, n_frames = _synth_y4m(i)
        rows.append(
            (
                i,
                kind,
                "video/x-yuv4mpeg",
                bytearray(payload),
                w,
                h,
                (n_frames - 1) * 40,  # 25 fps -> 40 ms frame period
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _synth_y4m(i: int) -> tuple:
    """Deterministic genuine Y4M video for media row ``i``: luma-only
    frames whose pixels are a pure function of (i, f, x, y) — decodable
    by the stdlib codec AND by ffmpeg, so the video leg is exercised
    for real in-container too (the ``_synth_png``/``_synth_wav`` move).
    Returns (payload, width, height, n_frames)."""
    from .y4mcodec import y4m_encode

    w = 8 + (i % 4) * 4
    h = 8 + (i % 5) * 2
    n_frames = 2 + (i % 4)
    frames = []
    for f in range(n_frames):
        plane = bytearray()
        for y in range(h):
            for x in range(w):
                plane.append((x * 7 + y * 13 + f * 29 + i * 3) % 256)
        frames.append(bytes(plane))
    return y4m_encode(w, h, frames), w, h, n_frames


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_class", T.StringType()),
    ]
)


def image_stats(df: DataFrame) -> DataFrame:
    """REAL image decode, value-checkable: stdlib-PNG decode (PIL never
    needed) -> geometry + integer-exact pixel stats per image row
    (px_mean floor-quantized to 4dp so the value is engine-pinnable).
    Non-image rows are skipped rows; undecodable payloads classify as
    decode_failed — the same error-channel contract as the text kernel.
    This is the in-container twin of the reference's real media
    transformation (pdf_converter.py:50-160 producing real PNGs)."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "channels", "px_mean",
                "px_min", "px_max", "status", "error_class",
            )}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                rec = dict(
                    media_id=mid, width=None, height=None, channels=None,
                    px_mean=None, px_min=None, px_max=None,
                    status="ok", error_class="",
                )
                b = bytes(payload) if payload is not None else b""
                if kind != "image":
                    rec.update(status="skipped", error_class="not_an_image")
                elif not b:
                    rec.update(status="no_payload")
                else:
                    try:
                        w, h, c, px = png_decode(b)
                        s = sum(px)
                        # floor-quantize: identical on every engine
                        mean4 = (s * 10000 // len(px)) / 10000
                        rec.update(
                            width=w, height=h, channels=c, px_mean=mean4,
                            px_min=min(px), px_max=max(px),
                        )
                    except PngFormatError:
                        rec.update(status="error", error_class="decode_failed")
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, IMAGE_STATS_SCHEMA)

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _dhash_bits(payload: bytes, grid_w: int = 9, grid_h: int = 8) -> int:
    """Difference-hash of one decoded image: mean-luma on a grid_w x
    grid_h box grid (integer box means — platform-exact like
    pngcodec.luma_grid_feature), one bit per horizontal neighbor pair
    (left > right), packed row-major into (grid_w-1)*grid_h bits.
    Robust to uniform brightness/contrast shifts by construction — the
    gradient SIGN survives any monotone per-pixel map."""
    from .pngcodec import png_decode

    width, height, channels, pixels = png_decode(payload)
    if channels == 1:
        lum = pixels
    elif channels == 2:
        lum = pixels[::2]
    else:
        lum = bytearray(width * height)
        step = channels
        for j in range(width * height):
            o = j * step
            lum[j] = (
                299 * pixels[o] + 587 * pixels[o + 1] + 114 * pixels[o + 2]
            ) // 1000
    means = []
    for gy in range(grid_h):
        y0, y1 = gy * height // grid_h, (gy + 1) * height // grid_h
        row_means = []
        for gx in range(grid_w):
            x0, x1 = gx * width // grid_w, (gx + 1) * width // grid_w
            npx = max(1, (y1 - y0) * (x1 - x0))
            s = 0
            for y in range(y0, max(y0 + 1, y1)):
                base = y * width
                for x in range(x0, max(x0 + 1, x1)):
                    s += lum[base + x]
            row_means.append(s // npx)
        means.append(row_means)
    h = 0
    for gy in range(grid_h):
        for gx in range(grid_w - 1):
            h <<= 1
            if means[gy][gx] > means[gy][gx + 1]:
                h |= 1
    return h - (1 << 64) if h >= (1 << 63) else h  # two's-complement long


def image_dhash(df: DataFrame) -> DataFrame:
    """Per-image perceptual difference-hash over the binary payload
    column — the dedup fingerprint for the multimodal lane: visually
    identical / brightness-shifted images collide, distinct images
    diverge, and near-misses sit a few hamming bits apart (pair them
    with [[image_near_dup_pairs]]). Built ON the real in-container PNG
    decoder (pngcodec.png_decode); undecodable payloads land on the
    ``decode_failed`` error channel, never abort the task — the
    reference's error-classification contract
    (/root/reference/src/services/pdf_converter.py:100-122).

    Plan: mapInPandas (Arrow batches, zero per-row Python at the plan
    level), map-only — no shuffle; 64-bit BIGINT output joins with
    plain equi-joins downstream.
    """

    def fn(batches):
        for pdf in batches:
            out = {"media_id": [], "status": [], "dhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                try:
                    out["dhash"].append(_dhash_bits(bytes(payload)))
                    out["status"].append("ok")
                except Exception:
                    out["dhash"].append(None)
                    out["status"].append("decode_failed")
            import pandas as pd

            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(fn, DHASH_SCHEMA)


def image_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 6, n_bands: int = 8
) -> DataFrame:
    """Near-duplicate image pairs from [[image_dhash]] signatures via
    the pigeonhole band join (the simhash_near_dup_pairs shape on a
    64-bit signature): split into ``n_bands`` 8-bit bands — any pair
    within ``max_hamming`` < n_bands differs in at most max_hamming
    bands and therefore SHARES at least one, so candidates come from a
    band equi-join, never a cross join; verify with bit_count(xor).

    Returns (id1, id2, hamming), id1 < id2.
    """
    if not max_hamming < n_bands:
        raise ValueError("pigeonhole needs max_hamming < n_bands")
    ok = hashes.filter(F.col("status") == "ok").select(
        F.col("media_id").alias("id"), "dhash"
    )
    width = 64 // n_bands
    bands = ok.select(
        "id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftrightunsigned(
                            F.col("dhash"), b * width
                        ).bitwiseAND(F.lit((1 << width) - 1)).alias("v"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "dhash", "band.b", "band.v")
    l = bands.select(
        F.col("b"), F.col("v"),
        F.col("id").alias("id1"), F.col("dhash").alias("h1"),
    )
    r = bands.select(
        F.col("b"), F.col("v"),
        F.col("id").alias("id2"), F.col("dhash").alias("h2"),
    )
    cand = (
        l.join(r, ["b", "v"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "h1", "h2")
        .distinct()
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cand.select(
        "id1", "id2", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("amp_mean", T.DoubleType()),
        T.StructField("amp_min", T.IntegerType()),
        T.StructField("amp_max", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_class", T.StringType()),
    ]
)


def audio_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode, value-checkable: stdlib-WAV decode
    ([[wavcodec]], no audio libs needed) -> format + integer-exact
    amplitude stats per audio row. The ``image_stats`` contract applied
    to the next modality: non-audio rows are skipped rows, undecodable
    payloads classify by the codec's stable error class.

    Exactness: ``energy`` is the exact BIGINT sum of squared samples;
    ``amp_mean`` floor-quantizes the mean via +32768-SHIFTED samples —
    Python ``//`` floors while SQL engines' integer division truncates,
    so the quantization is done where both agree (non-negative
    operands) and shifted back: ``(sum(s+32768)*10000 // n)/10000 -
    32768``. ``duration_ms`` is the exact integer
    ``n_frames * 1000 // sample_rate``.
    """

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from .wavcodec import wav_decode

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "channels", "n_frames",
                "duration_ms", "amp_mean", "amp_min", "amp_max",
                "energy", "status", "error_class",
            )}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                rec = dict(
                    media_id=mid, sample_rate=None, channels=None,
                    n_frames=None, duration_ms=None, amp_mean=None,
                    amp_min=None, amp_max=None, energy=None,
                    status="ok", error_class="",
                )
                b = bytes(payload) if payload is not None else b""
                if kind != "audio":
                    rec.update(status="skipped", error_class="not_audio")
                elif not b:
                    rec.update(status="no_payload")
                else:
                    try:
                        rate, ch, samples = wav_decode(b)
                        n = len(samples)
                        frames = n // ch
                        shifted = sum(s + 32768 for s in samples)
                        mean4 = (shifted * 10000 // n) / 10000 - 32768
                        rec.update(
                            sample_rate=rate,
                            channels=ch,
                            n_frames=frames,
                            duration_ms=frames * 1000 // rate,
                            amp_mean=mean4,
                            amp_min=min(samples),
                            amp_max=max(samples),
                            energy=sum(s * s for s in samples),
                        )
                    except ValueError as e:
                        rec.update(
                            status="error",
                            error_class=f"decode_failed:{e}",
                        )
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, AUDIO_STATS_SCHEMA)


VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_class", T.StringType()),
    ]
)


def video_stats(df: DataFrame) -> DataFrame:
    """REAL video decode, value-checkable: stdlib-Y4M decode
    ([[y4mcodec]]) -> one row PER FRAME with geometry + integer-exact
    luma stats (px_mean floor-4dp, the ``image_stats`` quantization) —
    the 1:N fan-out of the per-page PNG enumeration, now over genuine
    video bitstreams. Non-video rows emit one skipped row; undecodable
    payloads one error row classified by the codec's stable class."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from .y4mcodec import y4m_decode

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "width", "height", "px_mean",
                "px_min", "px_max", "status", "error_class",
            )}

            def emit(mid, idx=None, w=None, h=None, mean=None, mn=None,
                     mx=None, status="ok", err=""):
                for k, v in (
                    ("media_id", mid), ("frame_idx", idx), ("width", w),
                    ("height", h), ("px_mean", mean), ("px_min", mn),
                    ("px_max", mx), ("status", status),
                    ("error_class", err),
                ):
                    out[k].append(v)

            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                if kind != "video":
                    emit(mid, status="skipped", err="not_video")
                elif not b:
                    emit(mid, status="no_payload")
                else:
                    try:
                        w, h, _, _, frames = y4m_decode(b)
                        for f, plane in enumerate(frames, 1):
                            s = sum(plane)
                            emit(
                                mid, f, w, h,
                                (s * 10000 // len(plane)) / 10000,
                                min(plane), max(plane),
                            )
                    except ValueError as e:
                        emit(mid, status="error",
                             err=f"decode_failed:{e}")
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, VIDEO_STATS_SCHEMA)


SCENE_CUTS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mad", T.DoubleType()),
        T.StructField("is_cut", T.BooleanType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_class", T.StringType()),
    ]
)


def scene_cuts(df: DataFrame, threshold: float = 52.0) -> DataFrame:
    """Scene-cut detection over REAL decoded video ([[y4mcodec]]): one
    row per CONSECUTIVE frame pair with the mean absolute luma
    difference (MAD, the standard shot-boundary signal) and the cut
    flag ``mad > threshold`` — the frame-sampling curation move that
    picks per-shot keyframes instead of every-Nth-frame redundancy.

    ``frame_idx`` is the 1-based index of the LATER frame (the frame a
    cut begins on), matching [[video_stats]] numbering. MAD is
    integer-exact: sum |p_f - p_(f-1)| over the luma plane, then the
    ``image_stats`` floor-4dp quantization (s * 10000 // npx), so the
    cut decision reproduces bit-for-bit in the closed-form SQL oracle
    (the synthetic frames are a pure function of (i, f, x, y)).
    Non-video rows emit one skipped row, empty payloads no_payload,
    undecodable payloads one classified error row, single-frame videos
    one 'empty' row — the same composable row contract as
    [[video_stats]]. Map-only ``mapInPandas``; at 10^12 turns the
    decode parallelizes per-row with zero shuffle."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from .y4mcodec import y4m_decode

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "width", "height", "mad",
                "is_cut", "status", "error_class",
            )}

            def emit(mid, idx=None, w=None, h=None, mad=None, cut=None,
                     status="ok", err=""):
                for k, v in (
                    ("media_id", mid), ("frame_idx", idx), ("width", w),
                    ("height", h), ("mad", mad), ("is_cut", cut),
                    ("status", status), ("error_class", err),
                ):
                    out[k].append(v)

            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                if kind != "video":
                    emit(mid, status="skipped", err="not_video")
                elif not b:
                    emit(mid, status="no_payload")
                else:
                    try:
                        w, h, _, _, frames = y4m_decode(b)
                        if len(frames) < 2:
                            emit(mid, status="empty",
                                 err="single_frame")
                            continue
                        for f in range(1, len(frames)):
                            a, c = frames[f - 1], frames[f]
                            s = sum(
                                abs(p - q) for p, q in zip(a, c)
                            )
                            mad = (s * 10000 // len(c)) / 10000
                            emit(
                                mid, f + 1, w, h, mad,
                                bool(mad > threshold),
                            )
                    except ValueError as e:
                        emit(mid, status="error",
                             err=f"decode_failed:{e}")
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, SCENE_CUTS_SCHEMA)
