"""applyInPandasWithState: per-conversation cumulative progress whose state
survives a query restart (checkpointed state, not a reset) — the custom
stateful operator the builtin aggregations can't express."""

import os

import pytest
from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.datagen import GenConfig
from png_from_pdf_extracter_spark.plans import JobParams, extract_turns
from png_from_pdf_extracter_spark.sources import generate_transcripts
from png_from_pdf_extracter_spark.streaming import (
    conversation_progress_stateful,
    stream_extract,
)

PARAMS = JobParams(n_buckets=16, num_partitions=4)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stateful")
    d = {
        "in": str(root / "in"),
        "ckpt": str(root / "ckpt"),
        "out": str(root / "out"),
    }
    os.makedirs(d["in"], exist_ok=True)
    return d


def _run(spark, dirs, query_name):
    # memory sink cannot recover from a checkpoint; foreachBatch + parquet
    # can (update-mode rows land per batch, stamped with the batch id)
    out_dir = dirs["out"]

    def sink(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        conversation_progress_stateful(
            stream_extract(spark, dirs["in"], PARAMS)
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy(F.col("batch_id").desc())
    latest = (
        spark.read.parquet(out_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return {
        r["conv_id"]: (r["n_turns"], r["n_errors"], r["total_chars"])
        for r in latest.collect()
    }


def _batch_expect(spark, dirs):
    b = extract_turns(spark, spark.read.parquet(dirs["in"]), PARAMS)
    return {
        r["conv_id"]: (r["n"], r["e"], r["c"])
        for r in b.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("status") == "error", 1).otherwise(0)).alias("e"),
            F.sum(F.coalesce(F.length("extracted_text"), F.lit(0))).alias("c"),
        )
        .collect()
    }


def test_stateful_progress_matches_batch(spark, dirs):
    generate_transcripts(spark, GenConfig(seed=31, n_convs=20)).write.mode(
        "append"
    ).parquet(dirs["in"])
    got = _run(spark, dirs, "prog1")
    assert got == _batch_expect(spark, dirs)


def test_state_survives_restart_and_accumulates(spark, dirs):
    # append MORE turns for the SAME conversations (same seed -> same
    # conv_ids) plus some new ones; restart with the same checkpoint
    generate_transcripts(spark, GenConfig(seed=31, n_convs=30)).write.mode(
        "append"
    ).parquet(dirs["in"])
    got = _run(spark, dirs, "prog2")

    # cumulative over BOTH appends: totals equal a batch run over the whole
    # input dir — proving the restarted query resumed from persisted state
    # (a reset would undercount the first append's contribution for the
    # conversations present in both)
    assert got == _batch_expect(spark, dirs)
    # conversations from the first append really did get updated twice
    assert any(n > 0 for (n, _, _) in got.values())
    assert len(got) == 30


def test_tws_capability_gate(spark, dirs):
    """transformWithStateInPandas (Spark 4 typed-state API) is gated on
    google.protobuf in the workers — absent here, so the operator must
    refuse with a clear ImportError; when the dependency exists the twin
    runs the same tally as the legacy operator (parity pinned below)."""
    from png_from_pdf_extracter_spark.streaming import (
        conversation_progress_tws,
        tws_available,
    )

    generate_transcripts(spark, GenConfig(seed=31, n_convs=5)).write.mode(
        "append"
    ).parquet(dirs["in"])
    extracted = stream_extract(spark, dirs["in"], PARAMS)
    if not tws_available():
        with pytest.raises(ImportError, match="protobuf"):
            conversation_progress_tws(extracted)
        return
    out = conversation_progress_tws(extracted)  # pragma: no cover
    q = (
        out.writeStream.format("memory")
        .queryName("tws_prog")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(dirs["ckpt"], "tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["conv_id"]: (r["n_turns"], r["n_errors"], r["total_chars"])
        for r in spark.sql(
            "select * from tws_prog qualify row_number() over "
            "(partition by conv_id order by n_turns desc) = 1"
        ).collect()
    }
    assert got == _batch_expect(spark, dirs)
