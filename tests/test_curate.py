"""Curation pipeline invariants: the funnel stages partition the corpus,
and the 'kept' bucket is exactly the curate_corpus survivor set."""

from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.functions import curate

SF_DIR = "/root/testdata/sf0.001"
KW = dict(langs=("en",), min_quality=0.3, min_tokens=10, max_tokens=100_000)


def test_funnel_partitions_corpus(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    funnel = curate.curation_funnel(d, **KW)
    rows = {r["stage"]: r["n_docs"] for r in funnel.collect()}
    assert sum(rows.values()) == d.count()
    survivors = curate.curate_corpus(d, **KW)
    assert rows.get("kept", 0) == survivors.count()


def test_survivors_pass_all_gates(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = curate.curate_corpus(d, **KW)
    bad = s.filter(
        (F.col("lang") != "en")
        | (F.col("quality") < 0.3)
        | (F.col("n_tokens") < 10)
        | (F.col("n_tokens") > 100_000)
    )
    assert bad.count() == 0
    # dedup: one survivor per fingerprint, and it is the min doc_id
    per_fp = s.groupBy("fingerprint").agg(F.count("*").alias("n"))
    assert per_fp.filter(F.col("n") > 1).count() == 0
