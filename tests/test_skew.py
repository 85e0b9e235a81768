"""Skew: a hot conversation carrying ~50% of all rows must spread across
many tasks after the salted repartition (SURVEY.md §7 hard part #2). Without
salting, hash partitioning on conv_id alone would pin the hot conversation
to one task — the straggler that kills scaling efficiency at 10^12 turns."""

from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.datagen import GenConfig, gen_pandas
from png_from_pdf_extracter_spark.operators import salted_repartition
from png_from_pdf_extracter_spark.plans import JobParams, extract_turns
from png_from_pdf_extracter_spark.sources.transcripts import (
    TRANSCRIPTS_SCHEMA,
    with_partition_id,
)

GCFG = GenConfig(n_convs=30, hot_conv_share=0.5)


def test_hot_conversation_spreads_over_tasks(spark):
    tdf, _ = gen_pandas(GCFG)
    hot_rows = (tdf.conv_id == "conv-00000000").sum()
    assert hot_rows / len(tdf) > 0.3, "fixture not skewed enough"

    df = with_partition_id(
        spark.createDataFrame(tdf, schema=TRANSCRIPTS_SCHEMA), 16
    )
    salted = salted_repartition(df, 16, salt_buckets=8)
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .filter(F.col("conv_id") == "conv-00000000")
        .groupBy("pid")
        .count()
        .toPandas()
    )
    # the hot conversation lands on >= salt_buckets/2 distinct tasks and no
    # task holds more than half of it
    assert len(sizes) >= 4, f"hot conv on only {len(sizes)} partitions"
    assert sizes["count"].max() < hot_rows * 0.5

    # unsalted control: everything on one partition
    unsalted = (
        df.repartition(16, F.col("conv_id"))
        .withColumn("pid", F.spark_partition_id())
        .filter(F.col("conv_id") == "conv-00000000")
        .select("pid")
        .distinct()
        .count()
    )
    assert unsalted == 1


def test_skewed_input_still_correct(spark):
    """Equality gate holds on the skewed table (salting must not disturb
    per-turn results or ordering)."""
    tdf, edf = gen_pandas(GCFG)
    transcripts = spark.createDataFrame(tdf, schema=TRANSCRIPTS_SCHEMA)
    params = JobParams(n_buckets=16, extractor=GCFG.extractor, num_partitions=16)
    got = (
        extract_turns(spark, transcripts, params)
        .select("conv_id", "turn_idx", "extracted_text", "status")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = edf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["extracted_text"].values == exp["extracted_text"].values).all()
    assert got["status"].tolist() == exp["status"].tolist()


def test_auto_salt_shuffles_only_when_skewed(spark):
    from png_from_pdf_extracter_spark.operators import (
        max_key_share,
        salted_repartition_auto,
    )

    # skewed input: hot conv > 1/num_partitions share -> Exchange present
    hot_tdf, _ = gen_pandas(GCFG)
    hot = with_partition_id(
        spark.createDataFrame(hot_tdf, schema=TRANSCRIPTS_SCHEMA), 16
    )
    assert max_key_share(hot, sample_fraction=1.0) > 1 / 8
    salted = salted_repartition_auto(hot, 8, sample_fraction=1.0)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan

    # uniform input: no conversation exceeds a task's fair share -> no shuffle
    uni_tdf, _ = gen_pandas(GenConfig(n_convs=60))
    uni = with_partition_id(
        spark.createDataFrame(uni_tdf, schema=TRANSCRIPTS_SCHEMA), 16
    )
    assert max_key_share(uni, sample_fraction=1.0) < 1 / 8
    unsalted = salted_repartition_auto(uni, 8, sample_fraction=1.0)
    plan = unsalted._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_salt_mode_validation():
    import pytest

    with pytest.raises(ValueError):
        JobParams(salt_mode="sometimes")


def test_auto_mode_extraction_matches_always(spark):
    tdf, _ = gen_pandas(GenConfig(n_convs=25))
    df = spark.createDataFrame(tdf, schema=TRANSCRIPTS_SCHEMA)
    a = extract_turns(
        spark, df, JobParams(n_buckets=16, num_partitions=4, salt_mode="always")
    ).select("conv_id", "turn_idx", "extracted_text")
    b = extract_turns(
        spark, df, JobParams(n_buckets=16, num_partitions=4, salt_mode="auto")
    ).select(
        "conv_id",
        "turn_idx",
        F.col("extracted_text").alias("b_text"),
    )
    j = a.join(b, ["conv_id", "turn_idx"], "full_outer")
    assert j.count() == a.count() == b.count()
    assert (
        j.filter(~F.col("extracted_text").eqNullSafe(F.col("b_text"))).count()
        == 0
    )


def test_salted_equi_join_equals_plain_join(spark):
    """General big-big skewed equi-join: one key holds 50% of both sides;
    the salted plan must return exactly the plain join's rows, and the
    hot key's left rows must actually spread over >1 salt."""
    from png_from_pdf_extracter_spark.operators import salted_equi_join

    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1000, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("key"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 400).select(
        F.when(F.col("id") < 200, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("key"),
        F.col("id").alias("rv"),
    )
    plain = left.join(right, "key").select("key", "lv", "rv")
    salted = salted_equi_join(left, right, "key", ["HOT"], salt_buckets=8)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.select("key", "lv", "rv").collect())
    )
    # determinism: same result twice (hash salt, not rand())
    again = salted_equi_join(left, right, "key", ["HOT"], salt_buckets=8)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_salted_equi_join_left_outer_and_guard(spark):
    import pytest as _pytest

    from png_from_pdf_extracter_spark.operators import salted_equi_join

    left = spark.createDataFrame(
        [("HOT", 1), ("HOT", 2), ("cold", 3), ("nomatch", 4)], ["key", "lv"]
    )
    right = spark.createDataFrame(
        [("HOT", 10), ("cold", 30)], ["key", "rv"]
    )
    out = salted_equi_join(
        left, right, "key", ["HOT"], salt_buckets=4, how="left"
    )
    rows = sorted(map(tuple, out.select("key", "lv", "rv").collect()))
    assert rows == [
        ("HOT", 1, 10),
        ("HOT", 2, 10),
        ("cold", 3, 30),
        ("nomatch", 4, None),  # unmatched left row appears exactly once
    ]
    with _pytest.raises(ValueError):
        salted_equi_join(left, right, "key", ["HOT"], how="right")


# ------------------------------------------------------------ skew_report

def test_skew_report_uniform_gini_zero(spark):
    from png_from_pdf_extracter_spark.operators.salting import skew_report

    rows = [(k, i) for k in range(5) for i in range(4)]  # 5 keys x 4 rows
    df = spark.createDataFrame(rows, "key long, x long")
    r = skew_report(df, "key").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_key_rows"]) == (20, 5, 4)
    assert r["gini"] == 0.0
    assert r["top1_share"] == 0.2
    assert r["hot_factor"] == 1


def test_skew_report_hot_key_hand_computed(spark):
    from png_from_pdf_extracter_spark.operators.salting import skew_report

    rows = [(1, i) for i in range(9)] + [(2, 0)]  # counts asc [1, 9]
    df = spark.createDataFrame(rows, "key long, x long")
    r = skew_report(df, "key").collect()[0]
    # s2 = 1*1 + 2*9 = 19 ; gini = 38/20 - 3/2 = 0.4 — but in IEEE
    # doubles 1.9 - 1.5 = 0.39999999999999991, so the floor-6dp emitter
    # (deterministic across engines, which is the point) reads 0.399999;
    # pin via the same expression, not the decimal ideal
    import math

    assert r["gini"] == math.floor((38 / 20 - 3 / 2) * 1e6) / 1e6
    assert r["top1_share"] == 0.9
    assert r["hot_factor"] == 2  # ceil(9 * 2 / 10)


def test_skew_report_grouped(spark):
    from png_from_pdf_extracter_spark.operators.salting import skew_report

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 7)]
    df = spark.createDataFrame(rows, "g string, key long")
    out = {r["g"]: r for r in skew_report(df, "key", ("g",)).collect()}
    assert out["a"]["n_keys"] == 2 and out["a"]["max_key_rows"] == 2
    assert out["b"]["n_rows"] == 1 and out["b"]["gini"] == 0.0


# -------------------------------------------------------- rendezvous HRW

def test_rendezvous_minimal_movement_invariant(spark):
    """THE defining property: adding a shard moves keys ONLY onto the
    new shard — no key moves between surviving shards — and the moved
    fraction is ~1/(n+1)."""
    from png_from_pdf_extracter_spark.operators.salting import (
        rendezvous_shard,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    before = {
        r["k"]: r["shard"]
        for r in rendezvous_shard(df, "k", [f"s{i}" for i in range(8)]).collect()
    }
    after = {
        r["k"]: r["shard"]
        for r in rendezvous_shard(df, "k", [f"s{i}" for i in range(9)]).collect()
    }
    moved = {k for k in before if before[k] != after[k]}
    assert all(after[k] == "s8" for k in moved)
    # expected fraction 1/9 ~ 222 of 2000; allow generous slack
    assert 120 <= len(moved) <= 340, len(moved)


def test_rendezvous_deterministic_and_total(spark):
    from png_from_pdf_extracter_spark.operators.salting import (
        rendezvous_shard,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    shards = ["a", "b", "c"]
    one = rendezvous_shard(df, "k", shards)
    two = rendezvous_shard(df.repartition(7), "k", shards)
    assert (
        one.alias("x")
        .join(two.alias("y"), "k")
        .filter("x.shard <> y.shard")
        .count()
        == 0
    )
    assert one.filter("shard IS NULL").count() == 0


def test_rendezvous_rejects_bad_shard_lists(spark):
    import pytest

    from png_from_pdf_extracter_spark.operators.salting import (
        rendezvous_shard,
    )

    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        rendezvous_shard(df, "k", [])
    with pytest.raises(ValueError):
        rendezvous_shard(df, "k", [f"s{i}" for i in range(65)])
