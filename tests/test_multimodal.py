"""Multimodal plumbing: feature extraction, resize, frame sampling —
deterministic stub kernels, real batch/schema/fan-out contracts."""

import pytest
from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.functions import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media(spark, 60)


def test_features_deterministic(spark, media):
    a = {r["media_id"]: r["digest"]
         for r in multimodal.extract_media_features(media).collect()}
    b = {r["media_id"]: r["digest"]
         for r in multimodal.extract_media_features(media).collect()}
    assert a == b and len(a) == 60


def test_resize_contract(spark, media):
    from png_from_pdf_extracter_spark.functions.pngcodec import png_decode

    out = multimodal.resize_images(media, 64, 48)
    rows = out.collect()
    assert len(rows) == 60  # pass-through: every input row accounted for
    ok = [r for r in rows if r["status"] == "ok"]
    skipped = [r for r in rows if r["status"] == "skipped"]
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(ok) == n_images and len(skipped) == 60 - n_images
    srcs = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter(F.col("kind") == "image").collect()
    }
    for r in ok:
        assert (r["out_width"], r["out_height"]) == (64, 48)
        # synth_media image payloads are genuine PNGs -> the REAL resize
        # path ran: output decodes to the forced geometry with the
        # source's channel count
        w, h, c, _ = png_decode(bytes(r["payload"]))
        assert (w, h) == (64, 48)
        assert c == png_decode(srcs[r["media_id"]])[2]
    # deterministic across runs
    again = {r["media_id"]: bytes(r["payload"])
             for r in multimodal.resize_images(media, 64, 48).collect()
             if r["status"] == "ok"}
    assert {r["media_id"]: bytes(r["payload"]) for r in ok} == again
    # non-PNG image payloads fall back to the deterministic stand-in
    fake_img = spark.createDataFrame(
        [(99, "image", "image/jpeg", bytearray(b"\xff\xd8 not png"),
          8, 8, None)],
        multimodal.MEDIA_SCHEMA,
    )
    (fr,) = multimodal.resize_images(fake_img, 64, 48).collect()
    assert fr["status"] == "ok"
    assert len(fr["payload"]) == max(16, 64 * 48 // 64)


def test_frame_sampling_fanout(spark, media):
    frames = multimodal.sample_frames(media, every_ms=5000, max_frames=6)
    got = frames.collect()
    vids = {
        r["media_id"]: r["meta_duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    # per-video frame count = min(dur//every + 1, max_frames)
    from collections import Counter

    counts = Counter(r["media_id"] for r in got)
    assert set(counts) == set(vids)
    for mid, dur in vids.items():
        assert counts[mid] == min(dur // 5000 + 1, 6), mid
    # 1-indexed stable ordinals with correct timestamps; synth videos
    # are genuine Y4M since r4, so sampled frames come back as REAL
    # grayscale PNGs (decode in, decode out), not the 16-byte stub
    for r in got:
        assert r["ts_ms"] == (r["frame_idx"] - 1) * 5000
        assert bytes(r["frame_payload"][:8]) == b"\x89PNG\r\n\x1a\n"


def test_frame_sampling_rejects_bad_interval(spark, media):
    with pytest.raises(ValueError):
        multimodal.sample_frames(media, every_ms=0)


def test_decode_capability_gate():
    """Non-PNG without PIL must raise NotImplementedError (honest gate);
    the fake path must always work; PNG payloads must ALWAYS decode for
    real via the stdlib codec. Contract is identical on every path:
    FEATURE_DIM floats in [0, 1]."""
    from png_from_pdf_extracter_spark.functions.pngcodec import png_encode

    payload = b"not really an image" * 4
    fake = multimodal.decode_image(payload, fake=True)
    assert len(fake) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in fake)
    if not multimodal.HAVE_PIL:
        from png_from_pdf_extracter_spark.functions.pngcodec import (
            PngFormatError,
        )

        # known non-PNG magic = capability gap; garbage = corrupt
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\xff\xd8\xff\xe0" + payload)
        with pytest.raises(PngFormatError):
            multimodal.decode_image(payload)
    png = png_encode(8, 8, 1, bytes([128] * 64))
    real = multimodal.decode_image(png)
    assert len(real) == multimodal.FEATURE_DIM
    assert all(abs(v - 128 / 255.0) < 1e-9 for v in real)


def test_real_decode_error_channel(spark):
    """REAL decode through the distributed pipeline — runs in every
    container via the stdlib PNG codec (no PIL needed): a valid PNG
    decodes to the exact mean-luma grid; a corrupt payload is classified
    decode_failed — never a task failure."""
    from png_from_pdf_extracter_spark.functions.pngcodec import png_encode

    # constant-color RGB 8x8: luma of (200, 10, 10) = ITU-R 601 fixed point
    png = png_encode(8, 8, 3, bytes([200, 10, 10] * 64))
    rows = [
        (0, "image", "image/png", bytearray(png), 8, 8, None),
        (1, "image", "image/png", bytearray(b"corrupt bytes"), 8, 8, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in multimodal.extract_media_features(df, fake=False).collect()
    }
    assert got[0]["status"] == "ok"
    assert len(got[0]["feature"]) == multimodal.FEATURE_DIM
    luma = (299 * 200 + 587 * 10 + 114 * 10) // 1000
    # FEATURES_SCHEMA carries array<float>: float32 round-trip tolerance
    assert all(abs(v - luma / 255.0) < 1e-6 for v in got[0]["feature"])
    assert got[1]["status"] == "error"
    assert got[1]["error_class"] == "decode_failed"


def test_image_stats_real_decode(spark, media):
    """image_stats: geometry from the decoded PNG equals synth_media's
    claimed metadata; pixel stats are integer-exact; non-images skip."""
    out = {r["media_id"]: r for r in multimodal.image_stats(media).collect()}
    assert len(out) == 60
    metas = {
        r["media_id"]: (r["meta_width"], r["meta_height"])
        for r in media.collect()
    }
    n_ok = 0
    for mid, r in out.items():
        if r["status"] == "skipped":
            assert r["error_class"] == "not_an_image"
            continue
        assert r["status"] == "ok"
        assert (r["width"], r["height"]) == metas[mid]
        assert 0 <= r["px_min"] <= r["px_mean"] <= r["px_max"] <= 255
        n_ok += 1
    assert n_ok == 20  # every third of 60 rows is an image
    # corrupt image payload -> error channel, not task failure
    bad = spark.createDataFrame(
        [(7, "image", "image/png", bytearray(b"nope"), 4, 4, None)],
        multimodal.MEDIA_SCHEMA,
    )
    (r,) = multimodal.image_stats(bad).collect()
    assert (r["status"], r["error_class"]) == ("error", "decode_failed")


# ---- perceptual dHash + hamming near-dup ----

from png_from_pdf_extracter_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    image_dhash,
    image_near_dup_pairs,
)
from png_from_pdf_extracter_spark.functions.pngcodec import png_encode


def _grad_png(w=18, h=16, bias=0, seed=0):
    """Gray gradient PNG whose luma rises left->right; ``bias`` shifts
    every pixel uniformly (kept clamp-free so gradient signs survive)."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px.append(min(255, 40 + bias + x * 10 + (seed * 3) % 7))
    return png_encode(w, h, 1, bytes(px))


def _media_df(spark, rows):
    return spark.createDataFrame(
        [
            (i, "image", "image/png", bytearray(p), None, None, None)
            for i, p in rows
        ],
        MEDIA_SCHEMA,
    )


def test_dhash_identical_and_brightness_shift_collide(spark):
    base = _grad_png()
    shifted = _grad_png(bias=25)
    df = _media_df(spark, [(1, base), (2, base), (3, shifted)])
    out = {r["media_id"]: r for r in image_dhash(df).collect()}
    assert all(r["status"] == "ok" for r in out.values())
    assert out[1]["dhash"] == out[2]["dhash"]  # byte-identical
    # uniform brightness shift preserves every gradient sign
    assert out[1]["dhash"] == out[3]["dhash"]


def test_dhash_distinct_images_diverge_and_pairs_found(spark):
    base = _grad_png()
    # reversed gradient: every comparison flips -> far in hamming
    rev = png_encode(
        18, 16, 1,
        bytes(
            bytearray(
                min(255, 40 + (17 - x) * 10)
                for y in range(16)
                for x in range(18)
            )
        ),
    )
    df = _media_df(spark, [(1, base), (2, base), (3, rev)])
    pairs = image_near_dup_pairs(image_dhash(df), max_hamming=6).collect()
    assert {(r["id1"], r["id2"], r["hamming"]) for r in pairs} == {
        (1, 2, 0)
    }


def test_dhash_bad_payload_routes_to_error_channel(spark):
    df = _media_df(spark, [(1, b"not a png"), (2, _grad_png())])
    out = {r["media_id"]: r["status"] for r in image_dhash(df).collect()}
    assert out == {1: "decode_failed", 2: "ok"}


def test_near_dup_pigeonhole_guard(spark):
    import pytest

    df = _media_df(spark, [(1, _grad_png())])
    with pytest.raises(ValueError):
        image_near_dup_pairs(image_dhash(df), max_hamming=8, n_bands=8)


# ---- audio_stats (real in-container WAV decode) ----


def test_audio_stats_decodes_real_wavs_and_skips_others(spark):
    from png_from_pdf_extracter_spark.functions import multimodal

    out = {
        r["media_id"]: r
        for r in multimodal.audio_stats(
            multimodal.synth_media(spark, 12)
        ).collect()
    }
    assert len(out) == 12
    for i, r in out.items():
        if i % 3 == 1:  # audio rows
            assert r["status"] == "ok", r
            assert r["sample_rate"] == 8000 * (1 + i % 3)
            assert r["channels"] == 1 + i % 2
            assert r["n_frames"] == 120 + (i * 17) % 180
            assert r["duration_ms"] == (
                r["n_frames"] * 1000 // r["sample_rate"]
            )
            assert -32768 <= r["amp_min"] <= r["amp_max"] <= 32767
            assert r["energy"] > 0
        else:
            assert r["status"] == "skipped"
            assert r["error_class"] == "not_audio"


def test_audio_stats_matches_direct_decode(spark):
    # the Spark path must agree sample-for-sample with decoding the
    # fixture payload directly in the driver
    from png_from_pdf_extracter_spark.functions import multimodal
    from png_from_pdf_extracter_spark.functions.multimodal import _synth_wav
    from png_from_pdf_extracter_spark.functions.wavcodec import wav_decode

    payload, rate, ch, n_total = _synth_wav(1)
    drate, dch, samples = wav_decode(payload)
    assert (drate, dch, len(samples)) == (rate, ch, n_total)
    r = [
        x
        for x in multimodal.audio_stats(
            multimodal.synth_media(spark, 3)
        ).collect()
        if x["media_id"] == 1
    ][0]
    shifted = sum(s + 32768 for s in samples)
    assert r["amp_mean"] == (shifted * 10000 // len(samples)) / 10000 - 32768
    assert r["amp_min"] == min(samples)
    assert r["amp_max"] == max(samples)
    assert r["energy"] == sum(s * s for s in samples)


def test_audio_stats_error_channel_on_corrupt_payload(spark):
    from png_from_pdf_extracter_spark.functions import multimodal

    rows = [
        (0, "audio", "audio/wav", bytearray(b"RIFFxxxxJUNKdata"), None,
         None, None),
        (1, "audio", "audio/wav", bytearray(b""), None, None, None),
        (2, "audio", "audio/wav", bytearray(b"garbage bytes here"), None,
         None, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r for r in multimodal.audio_stats(df).collect()
    }
    assert out[1]["status"] == "no_payload"
    assert out[0]["status"] == "error"
    assert out[0]["error_class"].startswith("decode_failed:")
    assert out[2]["status"] == "error"
    assert out[2]["error_class"] == "decode_failed:bad_magic"


# ---- video_stats / real Y4M frame sampling ----


def test_video_stats_decodes_real_y4m_per_frame(spark):
    from png_from_pdf_extracter_spark.functions import multimodal
    from png_from_pdf_extracter_spark.functions.multimodal import _synth_y4m

    out = multimodal.video_stats(multimodal.synth_media(spark, 12)).collect()
    vids = [r for r in out if r["status"] == "ok"]
    assert vids, out
    by_id = {}
    for r in vids:
        by_id.setdefault(r["media_id"], []).append(r)
    for i, rows in by_id.items():
        _, w, h, n_frames = _synth_y4m(i)
        assert sorted(r["frame_idx"] for r in rows) == list(
            range(1, n_frames + 1)
        )
        for r in rows:
            assert (r["width"], r["height"]) == (w, h)
            f = r["frame_idx"] - 1
            px = [
                (x * 7 + y * 13 + f * 29 + i * 3) % 256
                for y in range(h)
                for x in range(w)
            ]
            assert r["px_min"] == min(px) and r["px_max"] == max(px)
            assert r["px_mean"] == (sum(px) * 10000 // len(px)) / 10000
    skipped = [r for r in out if r["status"] == "skipped"]
    assert all(r["error_class"] == "not_video" for r in skipped)


def test_video_stats_error_channel(spark):
    from png_from_pdf_extracter_spark.functions import multimodal

    rows = [
        (0, "video", "video/x-yuv4mpeg",
         bytearray(b"YUV4MPEG2 W0 H8 Cmono\n"), None, None, 40),
        (1, "video", "video/mp4", bytearray(b"\x00\x00\x00 ftypisom"),
         None, None, 40),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.video_stats(df).collect()}
    assert out[0]["status"] == "error"
    assert out[0]["error_class"] == "decode_failed:bad_header"
    assert out[1]["error_class"] == "decode_failed:bad_magic"


def test_sample_frames_real_path_picks_correct_frame(spark):
    # 25 fps -> 40ms period; every_ms=80 samples frames 0, 2, 4...
    from png_from_pdf_extracter_spark.functions import multimodal
    from png_from_pdf_extracter_spark.functions.multimodal import _synth_y4m
    from png_from_pdf_extracter_spark.functions.pngcodec import png_decode
    from png_from_pdf_extracter_spark.functions.y4mcodec import y4m_decode

    i = 3  # n_frames = 2 + 3 % 4 = 5, dur = 160ms
    payload, w, h, n_frames = _synth_y4m(i)
    df = spark.createDataFrame(
        [(i, "video", "video/x-yuv4mpeg", bytearray(payload), w, h,
          (n_frames - 1) * 40)],
        multimodal.MEDIA_SCHEMA,
    )
    got = sorted(
        multimodal.sample_frames(df, every_ms=80).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert len(got) == (n_frames - 1) * 40 // 80 + 1  # 3 samples
    _, _, _, _, frames = y4m_decode(payload)
    for r in got:
        want_frame = frames[min((r["ts_ms"]) // 40, n_frames - 1)]
        dw, dh, dc, px = png_decode(bytes(r["frame_payload"]))
        assert (dw, dh, dc) == (w, h, 1)
        assert bytes(px) == want_frame


def test_sample_frames_stub_fallback_for_compressed(spark):
    from png_from_pdf_extracter_spark.functions import multimodal

    df = spark.createDataFrame(
        [(7, "video", "video/mp4", bytearray(b"opaque-mp4-bytes"),
          64, 64, 2500)],
        multimodal.MEDIA_SCHEMA,
    )
    got = multimodal.sample_frames(df, every_ms=1000).collect()
    assert len(got) == 3
    assert all(len(r["frame_payload"]) == 16 for r in got)  # md5 stub


def test_scene_cuts_planted_cut(spark):
    from png_from_pdf_extracter_spark.functions.multimodal import (
        scene_cuts,
    )
    from png_from_pdf_extracter_spark.functions.y4mcodec import y4m_encode

    # three near-identical frames, then a hard cut to an inverted frame
    w, h = 8, 8
    base = bytes((x * 3 + y * 5) % 200 for y in range(h) for x in range(w))
    drift = bytes((p + 2) % 256 for p in base)
    cut = bytes(255 - p for p in base)
    payload = y4m_encode(w, h, [base, drift, base, cut])
    df = spark.createDataFrame(
        [(1, "video", "video/x-yuv4mpeg", bytearray(payload), w, h, 120),
         (2, "image", "image/png", bytearray(b"xx"), 4, 4, None)],
        "media_id long, kind string, mime string, payload binary,"
        " width int, height int, duration_ms int",
    )
    rows = {
        (r["media_id"], r["frame_idx"]): r
        for r in scene_cuts(df, threshold=50.0).collect()
    }
    assert rows[(1, 2)]["is_cut"] is False and rows[(1, 2)]["mad"] == 2.0
    assert rows[(1, 3)]["is_cut"] is False
    assert rows[(1, 4)]["is_cut"] is True and rows[(1, 4)]["mad"] > 50
    assert rows[(2, None)]["status"] == "skipped"
    # python twin of the exact quantized MAD on the cut pair
    s = sum(abs(a - b) for a, b in zip(base, cut))
    assert rows[(1, 4)]["mad"] == (s * 10000 // (w * h)) / 10000


def test_scene_cuts_degenerate_rows(spark):
    from png_from_pdf_extracter_spark.functions.multimodal import (
        scene_cuts,
    )
    from png_from_pdf_extracter_spark.functions.y4mcodec import y4m_encode

    single = y4m_encode(4, 4, [bytes(16)])
    df = spark.createDataFrame(
        [(1, "video", "v", bytearray(single), 4, 4, 0),
         (2, "video", "v", bytearray(b""), None, None, None),
         (3, "video", "v", bytearray(b"not a y4m stream"), None, None,
          None)],
        "media_id long, kind string, mime string, payload binary,"
        " width int, height int, duration_ms int",
    )
    out = {r["media_id"]: r for r in scene_cuts(df).collect()}
    assert out[1]["status"] == "empty"
    assert out[2]["status"] == "no_payload"
    assert out[3]["status"] == "error"
    assert out[3]["error_class"].startswith("decode_failed")
