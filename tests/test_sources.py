"""Multi-format transcript sources: schema-enforced json/csv decode must
roundtrip byte-identically with the parquet path (the RFC5322-decode analog
— external text formats in, typed rows out, no inference)."""

import pytest
from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.datagen import GenConfig
from png_from_pdf_extracter_spark.sources import (
    generate_transcripts,
    read_transcripts,
)


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_format_roundtrip_matches_parquet(spark, tmp_path, fmt):
    df = generate_transcripts(spark, GenConfig(seed=13, n_convs=12))
    pq = str(tmp_path / "pq")
    other = str(tmp_path / fmt)
    df.write.parquet(pq)
    out = df.withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ssXXX")
    )
    if fmt == "orc":
        # columnar path keeps native types — no string ts roundtrip
        df.write.orc(other)
    elif fmt == "json":
        out.write.json(other)
    else:
        (
            out.write.option("header", True)
            .option("escape", '"')
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(other)
        )

    a = read_transcripts(spark, pq, "parquet")
    b = read_transcripts(spark, other, fmt)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    j = a.select(cols).alias("a").join(
        b.select(cols).alias("b"), ["conv_id", "turn_idx"], "full_outer"
    )
    assert j.count() == a.count() == b.count()
    diff = j.filter(
        ~F.col("a.text").eqNullSafe(F.col("b.text"))
        | ~F.col("a.role").eqNullSafe(F.col("b.role"))
        | ~F.col("a.ts").eqNullSafe(F.col("b.ts"))
    ).count()
    assert diff == 0


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        read_transcripts(spark, "/nope", "xml")


def test_json_permissive_surfaces_malformed_as_nulls(spark, tmp_path):
    """A corrupt line must become a null-field row (PERMISSIVE error
    channel for the validation gate), never a scan failure."""
    p = tmp_path / "in"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"ok",'
        '"tool":"","ts":"2026-01-01T00:00:00Z"}\n'
        "THIS IS NOT JSON{{{\n"
        '{"conv_id":"c2","turn_idx":"not_an_int","role":"user",'
        '"text":"half-bad","tool":"","ts":"2026-01-01T00:00:00Z"}\n'
    )
    df = read_transcripts(spark, str(p), "json")
    rows = df.collect()
    assert len(rows) == 3  # nothing dropped, nothing raised
    ok = [r for r in rows if r["conv_id"] == "c1"]
    assert len(ok) == 1 and ok[0]["text"] == "ok"
    # corrupt + type-mismatch rows surface with nulls for the bad fields
    assert sum(1 for r in rows if r["turn_idx"] is None) == 2
