"""Bucketed tables: co-located join runs with zero Exchange nodes — the
pay-layout-once, join-shuffle-free-forever path for repeated big joins."""

from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.sources.catalog import Catalog


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_exchange(spark, tmp_path):
    catalog = Catalog(str(tmp_path / "wh"))
    left = (
        spark.range(0, 2000)
        .withColumn("conv_id", F.concat(F.lit("c"), (F.col("id") % 97)))
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
        .select("conv_id", "id", "payload")
    )
    right = (
        spark.range(0, 97)
        .withColumn("conv_id", F.concat(F.lit("c"), F.col("id")))
        .withColumn("meta", F.col("id") * 2)
        .select("conv_id", "meta")
    )
    catalog.write_bucketed(left, "bk_left", "conv_id", 8)
    catalog.write_bucketed(right, "bk_right", "conv_id", 8)

    a = catalog.read_bucketed(spark, "bk_left")
    b = catalog.read_bucketed(spark, "bk_right")
    # force sort-merge: broadcast would hide the bucketing co-location
    joined = a.hint("merge").join(b, "conv_id")

    plan = _plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    assert joined.count() == 2000

    # same key, same bucket count => groupBy on the bucket key also
    # aggregates without a shuffle
    agg = a.groupBy("conv_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(agg), _plan(agg)

    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_roundtrip_rows(spark, tmp_path):
    catalog = Catalog(str(tmp_path / "wh"))
    df = (
        spark.range(0, 500)
        .withColumn("conv_id", F.concat(F.lit("c"), (F.col("id") % 13)))
        .select("conv_id", "id")
    )
    catalog.write_bucketed(df, "bk_rt", "conv_id", 4)
    back = catalog.read_bucketed(spark, "bk_rt")
    assert sorted(r["id"] for r in back.collect()) == list(range(500))
    spark.sql("DROP TABLE IF EXISTS bk_rt")


def test_clustered_write_disjoint_file_ranges(spark, tmp_path):
    """write_clustered: each parquet file covers a non-overlapping slice
    of the cluster key (range partitioning + in-file sort), which is what
    lets footer min/max stats prune whole files on a filtered scan."""
    import glob

    catalog = Catalog(str(tmp_path / "wh"))
    df = (
        spark.range(0, 5000)
        .withColumn("k", (F.col("id") * 7919) % 5000)  # shuffled key
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    )
    catalog.write_clustered(df, "clustered", ["k"], n_files=8)

    files = sorted(glob.glob(str(tmp_path / "wh" / "clustered" / "*.parquet")))
    assert len(files) == 8
    ranges = []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
            .collect()[0]
        )
        ranges.append((r["lo"], r["hi"]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, hi2)}"
    # nothing lost in the re-layout
    total = spark.read.parquet(str(tmp_path / "wh" / "clustered")).count()
    assert total == 5000
