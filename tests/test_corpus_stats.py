"""Corpus-statistics operators: PMI collocations, Zipf fit, JS
divergence, two-sample KS. All are closed-form-checkable on planted
corpora — these tests pin exact values the DuckDB oracles then
re-confirm at sf scale.
"""
import math

from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.functions import drift, lm


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pmi_bigrams_closed_form(spark):
    # unigrams: a=3 b=2 c=1 (N_uni=6); bigrams: (a,b)=2 (a,c)=1 (N_big=3)
    # pmi(a,b) = log2((2/3) / ((3/6)*(2/6))) = log2(4) = 2.0
    # pmi(a,c) = log2((1/3) / ((3/6)*(1/6))) = log2(4) = 2.0
    d = _docs(spark, ["a b", "a b", "a c"])
    rows = {
        (r["a"], r["b"]): (r["n_ab"], r["pmi_q"])
        for r in lm.pmi_bigrams(d, min_count=1, top_k=10).collect()
    }
    assert rows == {("a", "b"): (2, 2.0), ("a", "c"): (1, 2.0)}


def test_pmi_min_count_filters(spark):
    d = _docs(spark, ["a b", "a b", "a c"])
    rows = lm.pmi_bigrams(d, min_count=2, top_k=10).collect()
    assert [(r["a"], r["b"]) for r in rows] == [("a", "b")]


def test_zipf_fit_exact_power_law(spark):
    # counts 12/rank at ranks 1..4 -> log2(cnt) = log2(12) - log2(rank):
    # an exact line with slope -1, r2 = 1
    words = (
        ["w1"] * 12 + ["w2"] * 6 + ["w3"] * 4 + ["w4"] * 3
    )
    d = _docs(spark, [" ".join(words)])
    r = lm.zipf_fit(d, top_k=10).collect()[0]
    assert r["n_tokens_ranked"] == 4
    assert r["slope"] == -1.0
    assert r["r2"] == 1.0


def test_js_divergence_bounds_and_symmetry(spark):
    a = _docs(spark, ["x y z x"])
    b = _docs(spark, ["x y z x"])
    same = lm.js_divergence(a, b).collect()[0]
    assert same["jsd_q"] == 0.0
    assert same["n_tokens_a"] == 4 and same["n_tokens_b"] == 4

    # dyadic shares (1/2,1/4,1/4 vs 1/2,1/2) so the disjoint-support
    # JSD of exactly 1 bit is exact in float regardless of sum order
    c = _docs(spark, ["p q p q"])
    disjoint = lm.js_divergence(a, c).collect()[0]
    assert disjoint["jsd_q"] == 1.0  # disjoint supports = exactly 1 bit

    ab = lm.js_divergence(a, c).collect()[0]["jsd_q"]
    ba = lm.js_divergence(c, a).collect()[0]["jsd_q"]
    assert ab == ba


def test_ks_statistic_exact_values(spark):
    base = spark.createDataFrame([(float(v),) for v in (1, 2)], "v double")
    cur = spark.createDataFrame([(float(v),) for v in (2, 3)], "v double")
    r = drift.ks_statistic(base, cur, "v").collect()[0]
    # cdf diffs at pooled values 1,2,3: |1/2-0|, |1-1/2|, |1-1| -> max 1/2
    assert (r["n_base"], r["n_cur"], r["ks_num"], r["ks"]) == (2, 2, 2, 0.5)

    disjoint = drift.ks_statistic(
        base,
        spark.createDataFrame([(9.0,), (10.0,), (11.0,)], "v double"),
        "v",
    ).collect()[0]
    assert disjoint["ks"] == 1.0 and disjoint["ks_num"] == 6


def test_ks_statistic_quantize_bins_map_side(spark):
    # with quantize=0, 1.26 and 0.74 pool into the same bin value 1.0:
    # identical binned distributions -> ks 0
    base = spark.createDataFrame([(1.26,), (2.0,)], "v double")
    cur = spark.createDataFrame([(0.74,), (2.4,)], "v double")
    r = drift.ks_statistic(base, cur, "v", quantize=0).collect()[0]
    assert r["ks"] == 0.0
