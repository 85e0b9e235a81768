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
