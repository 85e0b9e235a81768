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
