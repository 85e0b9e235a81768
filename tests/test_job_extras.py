"""Round-2 job-surface additions: base64 payload decode wired into the
plan, CC fan-out sink, reject run identity, metrics-derived row counts,
compact crash recovery, the null-conv_id bucket lockstep, and the
crash-window commit edge (NFR-007/008) between the data write and the
lineage commit.
"""

import pytest
from pathlib import Path
from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.datagen import GenConfig
from png_from_pdf_extracter_spark.plans import JobParams, extract_turns, run_job
from png_from_pdf_extracter_spark.plans import extract_plan
from png_from_pdf_extracter_spark.sources import generate_transcripts
from png_from_pdf_extracter_spark.sources.catalog import Catalog
from png_from_pdf_extracter_spark.sources.transcripts import (
    partition_bucket_py,
    with_partition_id,
)


def _out_cols(df):
    return df.select("conv_id", "turn_idx", "status", "extracted_text")


def test_payload_base64_plan_matches_plain(spark):
    """Base64-encoded input through payload_base64=True must extract
    byte-identically to the plain-text plan (ref get_payload(decode=True),
    job_processor.py:207). Includes MIME CRLF line wrapping, which Spark's
    base64() emits."""
    t = generate_transcripts(spark, GenConfig(n_convs=10))
    enc = t.withColumn("text", F.base64(F.col("text").cast("binary")))
    plain = _out_cols(
        extract_turns(spark, t, JobParams(n_buckets=8, num_partitions=4))
    )
    decoded = _out_cols(
        extract_turns(
            spark, enc,
            JobParams(n_buckets=8, num_partitions=4, payload_base64=True),
        )
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, decoded.collect())
    )


def test_payload_base64_invalid_rows_hit_error_channel(spark):
    """Undecodable base64 must flow through the error channel (null text ->
    no_payload), never fail the task."""
    rows = [("c1", 0, "user", "%%% not base64 %%%", "", None)]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = extract_turns(
        spark, t, JobParams(n_buckets=4, num_partitions=2, payload_base64=True)
    ).collect()
    assert len(out) == 1
    assert out[0]["status"] == "no_payload"


def test_cc_fanout_and_metrics_rowcount(spark, tmp_path):
    """cc_tables receive a copy of the run's rows; stats['rows'] now comes
    from the lineage aggregation (no extra count pass) and must equal the
    actual written row count."""
    cat = Catalog(str(tmp_path / "wh"))
    t = generate_transcripts(spark, GenConfig(n_convs=15))
    params = JobParams(
        n_buckets=8, num_partitions=4, cc_tables=("extract_cc", "extract_cc2")
    )
    stats = run_job(spark, t, cat, params)
    main_rows = cat.read(spark, "extracted_turns")
    assert stats["rows"] == main_rows.count() > 0
    for cc in params.cc_tables:
        assert cat.exists(cc)
        cc_rows = cat.read(spark, cc)
        key = ["conv_id", "turn_idx"]
        assert sorted(map(tuple, cc_rows.select(*key).collect())) == sorted(
            map(tuple, main_rows.select(*key).collect())
        )


def test_cc_tables_validation():
    with pytest.raises(ValueError, match="cc_tables"):
        JobParams(cc_tables=("ok", ""))


def test_rejects_carry_run_id(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    good = generate_transcripts(spark, GenConfig(n_convs=5))
    bad = spark.createDataFrame(
        [(None, 0, "user", "x", "", None)], good.schema
    )
    params = JobParams(n_buckets=8, num_partitions=4, validate_input=True)
    s1 = run_job(spark, good.unionByName(bad), cat, params)
    s2 = run_job(spark, good.unionByName(bad), cat, params)
    rejects = cat.read(spark, "input_rejects")
    assert "run_id" in rejects.columns
    # the re-run appends the same reject again, but with a distinct run_id
    assert rejects.count() == 2
    assert rejects.select("run_id").distinct().count() == 2
    assert {s1["started_at"], s2["started_at"]} == {
        r["run_id"] for r in rejects.select("run_id").collect()
    }


def test_crash_between_data_write_and_lineage_commit(spark, tmp_path, monkeypatch):
    """NFR-007/008 edge: a crash after the data write but before the
    extract_metrics append must leave the bucket uncommitted, and the next
    run must overwrite it with no duplicates and no gaps (at-least-once +
    idempotent re-run)."""
    cat = Catalog(str(tmp_path / "wh"))
    t = generate_transcripts(spark, GenConfig(n_convs=20))
    params = JobParams(n_buckets=8, num_partitions=4)

    def boom(*a, **k):
        raise RuntimeError("simulated crash before lineage commit")

    monkeypatch.setattr(extract_plan, "partition_metrics", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_job(spark, t, cat, params)
    monkeypatch.undo()

    # data landed, lineage did not -> everything still pending
    assert cat.exists("extracted_turns")
    assert not cat.exists("extract_metrics")

    stats = run_job(spark, t, cat, params)
    out = cat.read(spark, "extracted_turns")
    n_expected = t.filter(F.col("role").rlike(params.role_whitelist)).count()
    assert stats["rows"] == n_expected
    assert out.count() == n_expected  # no dupes
    assert (
        out.select("conv_id", "turn_idx").distinct().count() == n_expected
    )  # no gaps

    # and a third run resumes to zero new work
    assert run_job(spark, t, cat, params)["rows"] == 0


def test_compact_crash_recovery(spark, tmp_path):
    """A crash between compact's two renames leaves the live path missing
    and the data in __compact_old; any subsequent access must restore it."""
    import os

    cat = Catalog(str(tmp_path / "wh"))
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("p")
    )
    cat.overwrite(df, "tbl")
    n = cat.read(spark, "tbl").count()
    # simulate the torn state
    os.rename(cat.path("tbl"), cat.path("tbl") + "__compact_old")
    assert cat.exists("tbl")  # recovery ran
    assert cat.read(spark, "tbl").count() == n
    assert not cat.exists("tbl__compact_old__compact_old")  # no side effects


def test_partition_bucket_py_null_lockstep(spark):
    """The pure-Python twin must mirror the Spark sentinel for null
    conv_id (bucket -1)."""
    assert partition_bucket_py(None, 16) == -1
    df = spark.createDataFrame([(None,), ("c1",)], "conv_id string")
    got = {
        r["conv_id"]: r["partition_id"]
        for r in with_partition_id(df, 16).collect()
    }
    assert got[None] == -1
    assert got["c1"] == partition_bucket_py("c1", 16)


def test_run_curate_job_inprocess(spark, tmp_path):
    """jobs/run_curate.py end to end (in-process main — the --py-files
    submission contract itself is proven by test_submit_job): writes the
    funnel + survivor tables, the summary invariants hold, and bad
    params exit 1 without a session."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "jobs"))
    try:
        import run_curate
    finally:
        _sys.path.pop(0)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = str(tmp_path / "docs")
    docs.write.parquet(in_dir)
    wh = str(tmp_path / "wh")

    assert run_curate.main(
        ["--input", in_dir, "--warehouse", wh, "--langs", "en,de"]
    ) == 0
    cat = Catalog(wh)
    kept = cat.read(spark, "curated_docs")
    funnel = {r["stage"]: r["n_docs"]
              for r in cat.read(spark, "curation_funnel").collect()}
    assert sum(funnel.values()) == docs.count()
    assert funnel.get("kept", 0) == kept.count()
    assert set(
        r["lang"] for r in kept.select("lang").distinct().collect()
    ) <= {"en", "de"}

    # near-dup pass is a subset of the plain run
    n_plain = kept.count()
    assert run_curate.main(
        ["--input", in_dir, "--warehouse", wh, "--langs", "en,de",
         "--near-dup"]
    ) == 0
    # same path overwritten in the same session: drop the cached listing
    spark.catalog.refreshByPath(cat.path("curated_docs"))
    assert cat.read(spark, "curated_docs").count() <= n_plain

    # invalid params -> exit 1
    assert run_curate.main(
        ["--input", in_dir, "--warehouse", wh, "--langs", ""]
    ) == 1


def test_run_curate_blocklist_gate(spark, tmp_path):
    """--blocklist drops every doc containing any listed term (one
    Aho-Corasick pass), and the drop is reflected in the summary count
    and the survivor table."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "jobs"))
    try:
        import run_curate
    finally:
        _sys.path.pop(0)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = str(tmp_path / "docs")
    docs.write.parquet(in_dir)
    wh = str(tmp_path / "wh")

    assert run_curate.main(
        ["--input", in_dir, "--warehouse", wh, "--langs", "en,de"]
    ) == 0
    cat = Catalog(wh)
    n_plain = cat.read(spark, "curated_docs").count()

    assert run_curate.main(
        ["--input", in_dir, "--warehouse", wh, "--langs", "en,de",
         "--blocklist", "spark,window"]
    ) == 0
    spark.catalog.refreshByPath(cat.path("curated_docs"))
    kept = cat.read(spark, "curated_docs")
    assert kept.count() < n_plain
    # no survivor contains a blocked term
    bad = kept.filter(
        kept.text.contains("spark") | kept.text.contains("window")
    ).count()
    assert bad == 0
