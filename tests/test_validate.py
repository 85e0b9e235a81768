"""Validation operator: first-violation precedence and quarantine split."""

from datetime import datetime

from png_from_pdf_extracter_spark.operators import split_valid, validate_rows

TS = datetime(2026, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp"
)


def _rows():
    return [
        ("c1", 0, "user", "ok", "", TS),              # valid
        ("", 0, "user", "ok", "", TS),                # conv_id_empty
        ("c2", -5, "user", "ok", "", TS),             # turn_idx_negative
        ("c3", 1, "robot", "ok", "", TS),             # role_invalid
        ("c4", 2, "tool", None, "", TS),              # text_null
        ("c5", 3, "system", "x" * 100, "", TS),       # text_oversized @64
        ("c6", 4, "assistant", "ok", "", None),       # ts_null
        # precedence: empty conv_id wins over bad role
        ("", 5, "robot", "ok", "", TS),
    ]


def test_first_violation_precedence(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = validate_rows(df, max_text_bytes=64)
    got = [r["violation"] for r in out.collect()]
    assert got == [
        None,
        "conv_id_empty",
        "turn_idx_negative",
        "role_invalid",
        "text_null",
        "text_oversized",
        "ts_null",
        "conv_id_empty",
    ]


def test_split_valid(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    ok, bad = split_valid(df, max_text_bytes=64)
    assert ok.count() == 1
    assert bad.count() == 7
    assert "violation" not in ok.columns
    assert "violation" in bad.columns


def test_run_job_validate_input_quarantines_rejects(spark, tmp_path):
    """Job-level integration: dirty rows land in input_rejects, the
    extraction output contains only the valid conversations, and a null
    conv_id gets the sentinel bucket (never a hive null-partition)."""
    from png_from_pdf_extracter_spark.datagen import GenConfig
    from png_from_pdf_extracter_spark.plans import JobParams, run_job
    from png_from_pdf_extracter_spark.sources import generate_transcripts
    from png_from_pdf_extracter_spark.sources.catalog import Catalog

    good = generate_transcripts(spark, GenConfig(seed=3, n_convs=8))
    dirty = spark.createDataFrame(
        [
            (None, 0, "user", "null conv", "", TS),
            ("cX", -1, "user", "neg idx", "", TS),
            ("cY", 0, "user", None, "", TS),
        ],
        SCHEMA,
    )
    catalog = Catalog(str(tmp_path / "wh"))
    params = JobParams(n_buckets=8, num_partitions=4, validate_input=True)
    stats = run_job(
        spark, good.unionByName(dirty), catalog, params, resume=False
    )

    rejects = catalog.read(spark, "input_rejects")
    assert rejects.count() == 3
    assert {r["violation"] for r in rejects.collect()} == {
        "conv_id_empty", "turn_idx_negative", "text_null",
    }
    out = catalog.read(spark, "extracted_turns")
    assert out.filter(out.conv_id.isin("cX", "cY")).count() == 0
    assert out.filter(out.conv_id.isNull()).count() == 0
    assert stats["rows"] == out.count() > 0
