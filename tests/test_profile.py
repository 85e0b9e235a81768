"""Sketch profiling accuracy: HLL++ cardinality within its rsd bound and
approx percentiles within rank tolerance of the exact twin."""

import importlib.util


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


SF_DIR = "/root/testdata/sf0.01"


def test_sketch_tracks_exact(spark):
    m = _entry()
    exact = {
        r["event_type"]: r for r in m.queries()["q_profile"](spark, SF_DIR).collect()
    }
    sk = {
        r["event_type"]: r
        for r in m.queries()["q_profile_sketch"](spark, SF_DIR).collect()
    }
    assert set(exact) == set(sk)
    for et, ex in exact.items():
        s = sk[et]
        # HLL++ at rsd=0.02: allow 3 sigma + integer slack
        assert abs(s["approx_users"] - ex["n_users"]) <= max(
            3, 0.06 * ex["n_users"]
        ), et
        # approx_percentile with 10k accuracy on uniform-ish values:
        # within 5% of the exact quantile's value range
        for a, b in (("p50_approx", "p50"), ("p95_approx", "p95")):
            assert abs(s[a] - ex[b]) <= 0.05 * max(abs(ex[b]), 1.0), (et, a)


def test_merge_law_random_splits(spark):
    """merge(partial(A), partial(B), ...) == partial(whole), for arbitrary
    disjoint splits — the contract that lets a stored profile absorb new
    batches without rescanning the corpus."""
    from pyspark.sql import functions as F

    from png_from_pdf_extracter_spark.functions import incremental

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    direct = {
        r["event_type"]: r
        for r in incremental.finalize_profile(
            incremental.partial_profile(e, "event_type", "value"),
            "event_type",
        ).collect()
    }
    # three-way disjoint split on a hash, merged back
    h = F.abs(F.hash("event_id")) % 3
    parts = [
        incremental.partial_profile(
            e.filter(h == i), "event_type", "value"
        )
        for i in range(3)
    ]
    merged = {
        r["event_type"]: r
        for r in incremental.finalize_profile(
            incremental.merge_profiles("event_type", *parts), "event_type"
        ).collect()
    }
    assert set(merged) == set(direct)
    for k in direct:
        for col in ("n", "mn", "mx"):
            assert merged[k][col] == direct[k][col], (k, col)
        for col in ("mean", "std"):
            assert abs(merged[k][col] - direct[k][col]) < 1e-3, (k, col)


def test_cms_overestimates_and_merges(spark):
    """Count-min sketch (functions/sketch.py): estimates are exact or
    one-sided overestimates, unseen items report 0, and merging per-batch
    sketches equals sketching the union — the mergeability that makes it
    an incremental 100 TB aggregate."""
    from pyspark.sql import functions as F

    from png_from_pdf_extracter_spark.functions import sketch as sk

    a = spark.createDataFrame(
        [("x",)] * 50 + [("y",)] * 7 + [("z",)] * 1, ["w"]
    )
    b = spark.createDataFrame([("x",)] * 25 + [("q",)] * 3, ["w"])
    s_a = sk.cms_build(a, "w", depth=4, width=64)
    s_b = sk.cms_build(b, "w", depth=4, width=64)
    merged = sk.cms_merge(s_a, s_b)
    union_sketch = sk.cms_build(a.unionByName(b), "w", depth=4, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union_sketch.collect())
    )

    items = spark.createDataFrame(
        [("x",), ("y",), ("z",), ("q",), ("never",)], ["w"]
    )
    est = {
        r["item"]: r["est"]
        for r in sk.cms_estimate(merged, items, "w", depth=4, width=64).collect()
    }
    true = {"x": 75, "y": 7, "z": 1, "q": 3, "never": 0}
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
    # width 64 >> 4 distinct items: collisions are unlikely; x at least exact
    assert est["x"] == 75 and est["never"] == 0


# ---- KMV distinct-count sketch ----

from png_from_pdf_extracter_spark.functions.sketch import (  # noqa: E402
    kmv_build,
    kmv_estimate,
    kmv_merge,
)


def _items(spark, n, grp="g"):
    return spark.createDataFrame(
        [(grp, f"item-{i}") for i in range(n)], "g string, item string"
    )


def test_kmv_small_groups_are_exact(spark):
    # fewer distinct items than k: the sketch saw every hash -> exact
    df = _items(spark, 40).union(_items(spark, 40))  # dupes collapse
    sk = kmv_build(df, "item", ("g",), k=64)
    r = kmv_estimate(sk, ("g",), k=64).collect()[0]
    assert (r["n_seen"], r["est_distinct"]) == (40, 40)


def test_kmv_estimate_within_sketch_error(spark):
    # 2000 distinct items, k=64: relative error concentrates around
    # 1/sqrt(k-2) ~ 12.7%; assert a generous 3-sigma band
    sk = kmv_build(_items(spark, 2000), "item", ("g",), k=64)
    r = kmv_estimate(sk, ("g",), k=64).collect()[0]
    assert r["n_seen"] == 64
    assert 2000 * 0.6 < r["est_distinct"] < 2000 * 1.4


def test_kmv_shard_merge_equals_whole_corpus_sketch(spark):
    # mergeability: sketch each shard, union states, re-top-k on the
    # hash column -> identical k-set (and thus identical estimate) to
    # sketching the whole corpus at once
    whole = _items(spark, 500)
    s1 = kmv_build(_items(spark, 300), "item", ("g",), k=32)
    s2 = kmv_build(
        spark.createDataFrame(
            [("g", f"item-{i}") for i in range(250, 500)],
            "g string, item string",
        ),
        "item",
        ("g",),
        k=32,
    )
    merged = kmv_merge([s1, s2], ("g",), k=32)
    direct = kmv_build(whole, "item", ("g",), k=32)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def test_heavy_hitters_exact_vs_groupby(spark):
    import random

    from pyspark.sql import functions as F

    from png_from_pdf_extracter_spark.functions.sketch import heavy_hitters

    rng = random.Random(3)
    # zipf-ish: a few heavy items + a long uniform tail, spread over
    # many partitions so the per-partition MG summaries must merge
    rows = (
        [("hot_a",)] * 400
        + [("hot_b",)] * 250
        + [("warm_c",)] * 60
        + [(f"tail_{rng.randrange(2000)}",) for _ in range(4000)]
    )
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "item", threshold_frac=0.01).collect()
    }
    n = len(rows)
    exact = {
        (r["item"], r["cnt"])
        for r in df.groupBy("item")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= -(-n // 100))
        .collect()
    }
    assert got == exact and ("hot_a", 400) in got


def test_heavy_hitters_order_stable_under_partitioning(spark):
    from png_from_pdf_extracter_spark.functions.sketch import heavy_hitters

    rows = [(f"k{i % 7}",) for i in range(700)] + [
        (f"rare_{i}",) for i in range(300)
    ]
    df1 = spark.createDataFrame(rows, "item string").repartition(2)
    df2 = spark.createDataFrame(list(reversed(rows)), "item string").repartition(16)
    r1 = [tuple(r) for r in heavy_hitters(df1, "item", 0.05).collect()]
    r2 = [tuple(r) for r in heavy_hitters(df2, "item", 0.05).collect()]
    # arrival order and partition count must not change the output
    assert r1 == r2 and len(r1) == 7


def test_naive_bayes_separable_and_oov(spark):
    from pyspark.sql import functions as F

    from png_from_pdf_extracter_spark.functions.evalmetrics import (
        naive_bayes_predict,
        naive_bayes_train,
    )

    rows = [
        (1, "spam", ["buy", "cheap", "pills", "now"]),
        (2, "spam", ["cheap", "pills", "buy"]),
        (3, "ham", ["meeting", "notes", "attached"]),
        (4, "ham", ["see", "notes", "meeting"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, label string, toks array<string>")
    wm, lm = naive_bayes_train(df, "toks", "label")
    assert wm.count() > 0 and lm.count() == 2
    pred = {
        r["id"]: r["pred"]
        for r in naive_bayes_predict(df, "doc_id", "toks", wm, lm).collect()
    }
    assert pred == {1: "spam", 2: "spam", 3: "ham", 4: "ham"}
    # all-OOV doc: scores reduce to len*oov + prior per label; 'ham'
    # and 'spam' tie on counts -> lexicographically smaller label wins
    oov = spark.createDataFrame(
        [(9, ["zzz", "qqq"])], "doc_id long, toks array<string>"
    )
    p9 = naive_bayes_predict(oov, "doc_id", "toks", wm, lm).collect()[0]
    assert p9["pred"] == "ham"
    # score is the integer-quantized sum: recompute in python
    import math

    toks = [t for _, lab, ts in rows for t in ts]
    v = len(set(toks))
    t_ham = sum(len(ts) for _, lab, ts in rows if lab == "ham")
    oov_q = math.floor(math.log(1.0 / (t_ham + 1.0 * v)) * 1e6)
    prior_q = math.floor(math.log(2.0 / 4.0) * 1e6)
    assert p9["score_q"] == 2 * oov_q + prior_q


def test_kmv_set_ops_accuracy_and_exact_small_range(spark):
    from pyspark.sql import functions as F

    from png_from_pdf_extracter_spark.functions.sketch import (
        kmv_build,
        kmv_set_ops,
    )

    # overlapping ranges with known truth: |A|=600, |B|=600, |A∩B|=200
    a_ids = spark.range(0, 600).select(F.col("id"))
    b_ids = spark.range(400, 1000).select(F.col("id"))
    a = kmv_build(a_ids, "id", (), 64)
    b = kmv_build(b_ids, "id", (), 64)
    r = kmv_set_ops(a, b, 64).collect()[0]
    # union truth 1000, jaccard truth 0.2 — k=64 gives ~12% rel error
    assert 600 < r["est_union"] < 1500
    assert 0.05 < r["jaccard_q6"] < 0.45
    assert 50 < r["est_intersection"] < 450
    # small range: everything exact when both sides fit in k
    sa = kmv_build(spark.range(0, 30), "id", (), 64)
    sb = kmv_build(spark.range(20, 50), "id", (), 64)
    r2 = kmv_set_ops(sa, sb, 64).collect()[0]
    assert r2["est_union"] == 50 and r2["union_k"] == 50
    assert r2["inter_in_k"] == 10 and r2["est_intersection"] == 10
    assert r2["jaccard_q6"] == 0.2


def test_naive_bayes_min_df_prunes_to_oov(spark):
    from png_from_pdf_extracter_spark.functions.evalmetrics import (
        naive_bayes_predict,
        naive_bayes_train,
    )

    rows = [
        (1, "spam", ["buy", "cheap", "buy", "rarespam"]),
        (2, "spam", ["cheap", "buy"]),
        (3, "ham", ["meeting", "notes", "meeting"]),
        (4, "ham", ["notes", "meeting"]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, label string, toks array<string>"
    )
    wm_full, lm_full = naive_bayes_train(df, "toks", "label")
    wm, lm = naive_bayes_train(df, "toks", "label", min_df=2)
    kept = {r["word"] for r in wm.select("word").distinct().collect()}
    assert "rarespam" not in kept and "buy" in kept
    # smoothing denominator keeps the FULL vocab: retained rows carry
    # identical quantized log-probs in both models
    full = {
        (r["word"], r["label"]): r["lp_q"] for r in wm_full.collect()
    }
    for r in wm.collect():
        assert r["lp_q"] == full[(r["word"], r["label"])]
    # prediction still separates the classes with the pruned model
    pred = {
        r["id"]: r["pred"]
        for r in naive_bayes_predict(df, "doc_id", "toks", wm, lm).collect()
    }
    assert pred[1] == "spam" and pred[3] == "ham"
