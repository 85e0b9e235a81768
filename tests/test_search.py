"""BM25 ranking (functions/search.py) — scores pinned against an
independent pure-Python reimplementation of the Lucene-parameterized
formula, plus contract checks (zero-hit docs absent, top-k cutoff,
deterministic tie-break)."""

import math

import pytest

from png_from_pdf_extracter_spark.functions import search

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "durian durian durian durian"),
    (4, "apple apple apple apple banana"),
]


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    out = {}
    for i, t in toks.items():
        s, hits = 0.0, 0
        for q in terms:
            tf = t.count(q)
            if tf == 0 or df[q] == 0:
                continue
            hits += 1
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if hits:
            out[i] = (hits, round(s, 4))
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_scores_match_reference_formula(spark, df):
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in search.bm25_topk(df, ["apple", "banana"]).collect()
    }
    assert got == _py_bm25(DOCS, ["apple", "banana"])
    # durian-only doc matches nothing and must be absent
    assert 3 not in got


def test_bm25_rank_and_topk_cutoff(spark, df):
    rows = search.bm25_topk(df, ["apple", "banana"], top_k=2).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        1,
        2,
    ]
    exp = _py_bm25(DOCS, ["apple", "banana"])
    best2 = sorted(exp, key=lambda i: (-exp[i][1], i))[:2]
    assert sorted(r["doc_id"] for r in rows) == sorted(best2)


def test_bm25_no_matches_empty(spark, df):
    assert search.bm25_topk(df, ["zzz"]).count() == 0


# ------------------------------------------------------------- RRF fusion

def test_rrf_fuse_hand_computed(spark):
    """doc 1 ranked 1st+2nd, doc 2 only lexical, doc 3 only dense —
    scores must equal the literal 1/(60+r) sums and order accordingly."""
    from png_from_pdf_extracter_spark.functions.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(1, 2), (3, 1)], "doc_id long, rank int")
    out = {r["id"]: r for r in rrf_fuse(a, b, k=60).collect()}
    import math

    def q(x):
        return math.floor(x * 1e9) / 1e9

    assert out[1]["rrf_q"] == q(1 / 61 + 1 / 62)
    assert out[2]["rrf_q"] == q(1 / 62)
    assert out[3]["rrf_q"] == q(1 / 61)
    assert out[1]["fused_rank"] == 1
    assert out[3]["fused_rank"] == 2  # 1/61 > 1/62
    assert out[2]["rank_b"] is None and out[3]["rank_a"] is None


def test_rrf_fuse_tie_breaks_by_id(spark):
    from png_from_pdf_extracter_spark.functions.search import rrf_fuse

    a = spark.createDataFrame([(5, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (5, 2)], "doc_id long, rank int")
    out = {r["id"]: r["fused_rank"] for r in rrf_fuse(a, b).collect()}
    assert out == {2: 1, 5: 2}  # equal scores -> lower id first


def test_prf_expand_finds_co_occurring_terms(spark):
    from png_from_pdf_extracter_spark.functions.search import prf_expand

    # docs about 'query' consistently co-mention 'planner'; unrelated
    # docs co-mention 'pudding'
    rows = [
        (1, "query planner cost planner model"),
        (2, "query planner rewrite rules"),
        (3, "query planner join order planner"),
        (4, "pudding recipe sugar pudding"),
        (5, "pudding butter flour"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exp = prf_expand(
        df, ["query"], fb_docs=3, n_expansion=3, max_df_frac=1.0
    ).collect()
    terms = [r["term"] for r in exp]
    assert terms[0] == "planner" and exp[0]["fb_tf"] == 5
    assert "pudding" not in terms
    # ranks are 1..n and fb_tf non-increasing
    assert [r["rank"] for r in exp] == list(range(1, len(exp) + 1))
    tfs = [r["fb_tf"] for r in exp]
    assert tfs == sorted(tfs, reverse=True)


def test_prf_expand_df_ceiling_drops_stopwords(spark):
    from png_from_pdf_extracter_spark.functions.search import prf_expand

    # 'the' appears in EVERY doc -> df ceiling 0.5 must drop it even
    # though its feedback tf dominates
    rows = [
        (1, "the query planner the the"),
        (2, "the query planner the"),
        (3, "the pudding the"),
        (4, "the pudding the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exp = prf_expand(
        df, ["query"], fb_docs=2, n_expansion=5, max_df_frac=0.5
    ).collect()
    terms = {r["term"] for r in exp}
    assert terms == {"planner"}


def test_prf_rerank_pulls_in_expansion_only_docs(spark):
    from png_from_pdf_extracter_spark.functions.search import (
        bm25_topk,
        prf_rerank,
    )

    # doc 6 never contains 'query' but is rich in the expansion term
    # 'planner' -> first pass misses it, PRF rerank retrieves it
    rows = [
        (1, "query planner cost model"),
        (2, "query planner rewrite"),
        (3, "query join order"),
        (4, "pudding recipe sugar"),
        (5, "pudding butter flour"),
        (6, "planner planner planner heuristics"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    first = {r["doc_id"] for r in bm25_topk(df, ["query"], top_k=6).collect()}
    assert 6 not in first
    rer = {
        r["doc_id"]
        for r in prf_rerank(
            df, ["query"], fb_docs=3, n_expansion=2,
            max_df_frac=1.0, top_k=6,
        ).collect()
    }
    assert 6 in rer and 4 not in rer and 5 not in rer


def test_rbo_identical_and_disjoint(spark):
    from png_from_pdf_extracter_spark.functions.search import rbo_overlap

    ids = list(range(1, 11))
    ra = spark.createDataFrame(
        [(i, r) for r, i in enumerate(ids, 1)], "doc_id long, rank int"
    )
    r = rbo_overlap(ra, ra, p=0.9, k=10).collect()[0]
    # identical rankings: X_d = d at every depth -> truncated RBO =
    # (1-p) * sum p^(d-1)
    exp = 0.1 * sum(0.9 ** (d - 1) for d in range(1, 11))
    assert abs(r["rbo_q6"] - exp) < 2e-6
    assert r["overlap_k"] == 10 and r["n_common"] == 10
    rb = spark.createDataFrame(
        [(i + 100, r) for r, i in enumerate(ids, 1)],
        "doc_id long, rank int",
    )
    r2 = rbo_overlap(ra, rb, p=0.9, k=10).collect()[0]
    assert r2["rbo_q6"] == 0.0 and r2["n_common"] == 0


def test_rbo_top_weighting(spark):
    from png_from_pdf_extracter_spark.functions.search import rbo_overlap

    base = [(i, r) for r, i in enumerate(range(1, 11), 1)]
    ra = spark.createDataFrame(base, "doc_id long, rank int")
    # swap at the TOP (ranks 1,2) vs swap at the BOTTOM (9,10):
    # top disagreement must cost more RBO
    by_rank = {r: i for i, r in base}

    def swapped(r1, r2):
        rows = [
            (by_rank[r2] if r == r1 else by_rank[r1] if r == r2 else i, r)
            for i, r in base
        ]
        return spark.createDataFrame(rows, "doc_id long, rank int")

    top = rbo_overlap(ra, swapped(1, 2), p=0.9, k=10).collect()[0]
    bot = rbo_overlap(ra, swapped(9, 10), p=0.9, k=10).collect()[0]
    assert top["rbo_q6"] < bot["rbo_q6"]


def test_ql_topk_hand_computed(spark):
    from png_from_pdf_extracter_spark.functions.search import ql_topk
    import math

    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog bird"),
            (3, "fish fish fish"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ql_topk(docs, ["cat", "dog"], mu=10.0, top_k=10).collect()
    }
    # collection: 8 tokens; cf(cat)=2, cf(dog)=2 -> p=0.25, mp=2.5
    # qconst = ln(2.5) + ln(2.5)
    qc = 2 * math.log(2.5)

    def score(dl, tfs):
        s = qc - 2 * math.log(dl + 10.0)
        for tf in tfs:
            s += math.log(1 + tf / 2.5)
        return s

    assert abs(out[1]["score_q6"] - score(3, [2, 1])) < 2e-6
    assert abs(out[2]["score_q6"] - score(2, [1])) < 2e-6
    # doc 3 hits no query term: not ranked
    assert 3 not in out
    # doc1 (both terms, higher tf) outranks doc2
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2
    assert out[1]["n_terms_hit"] == 2 and out[2]["n_terms_hit"] == 1


def test_ql_topk_absent_term_dropped(spark):
    from png_from_pdf_extracter_spark.functions.search import ql_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha")],
        "doc_id long, text string",
    )
    # 'zzz' has zero collection frequency -> dropped from the model on
    # both engines; ranking falls back to the 'alpha' model alone
    out = ql_topk(docs, ["alpha", "zzz"], mu=5.0, top_k=10).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["rank"] == 1  # higher tf, same dl
