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
    out = multimodal.resize_images(media, 64, 48)
    rows = out.collect()
    assert len(rows) == 60  # pass-through: every input row accounted for
    ok = [r for r in rows if r["status"] == "ok"]
    skipped = [r for r in rows if r["status"] == "skipped"]
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(ok) == n_images and len(skipped) == 60 - n_images
    for r in ok:
        assert (r["out_width"], r["out_height"]) == (64, 48)
        assert len(r["payload"]) == max(16, 64 * 48 // 64)
    # deterministic across runs
    again = {r["media_id"]: bytes(r["payload"])
             for r in multimodal.resize_images(media, 64, 48).collect()
             if r["status"] == "ok"}
    assert {r["media_id"]: bytes(r["payload"]) for r in ok} == again


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
    # 1-indexed stable ordinals with correct timestamps
    for r in got:
        assert r["ts_ms"] == (r["frame_idx"] - 1) * 5000
        assert len(r["frame_payload"]) == 16


def test_frame_sampling_rejects_bad_interval(spark, media):
    with pytest.raises(ValueError):
        multimodal.sample_frames(media, every_ms=0)


def test_decode_capability_gate():
    """Without PIL the real path must raise NotImplementedError (honest
    stub); the fake path must always work. Contract is identical either
    way: FEATURE_DIM floats in [0, 1]."""
    payload = b"not really an image" * 4
    fake = multimodal.decode_image(payload, fake=True)
    assert len(fake) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in fake)
    if not multimodal.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(payload)


def test_real_decode_error_channel(spark):
    """When PIL IS available: a valid image decodes to FEATURE_DIM floats;
    a corrupt payload is classified decode_failed — never a task failure.
    Skips in containers without PIL (the fake-path twin of this contract
    is exercised by test_features_deterministic)."""
    if not multimodal.HAVE_PIL:
        pytest.skip("PIL not installed in this container")
    from PIL import Image
    import io

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (200, 10, 10)).save(buf, format="PNG")
    rows = [
        (0, "image", "image/png", bytearray(buf.getvalue()), 8, 8, None),
        (1, "image", "image/png", bytearray(b"corrupt bytes"), 8, 8, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in multimodal.extract_media_features(df, fake=False).collect()
    }
    assert got[0]["status"] == "ok"
    assert len(got[0]["feature"]) == multimodal.FEATURE_DIM
    assert got[1]["status"] == "error"
    assert got[1]["error_class"] == "decode_failed"
