"""Unigram perplexity scoring (functions/lm.py)."""

import math

import pytest
from pyspark.sql import Row

from png_from_pdf_extracter_spark.functions import lm


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a a b"),
            Row(doc_id=2, text="  A  b  "),  # case/whitespace normalization
            Row(doc_id=3, text="c"),
            Row(doc_id=4, text="   "),  # no tokens -> no output row
        ]
    )


def test_unigram_perplexity_hand_computed(spark, docs):
    # corpus counts: a=3 (two in doc1, one in doc2), b=2, c=1; total=6
    out = {r["doc_id"]: r for r in lm.unigram_perplexity(docs).collect()}
    assert set(out) == {1, 2, 3}
    pa, pb, pc = 3 / 6, 2 / 6, 1 / 6
    nll1 = -(2 * math.log(pa) + math.log(pb)) / 3
    nll3 = -math.log(pc)
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_nll"] == pytest.approx(round(nll1, 3))
    assert out[1]["ppl"] == pytest.approx(round(math.exp(nll1), 1))
    assert out[2]["n_tokens"] == 2
    assert out[3]["avg_nll"] == pytest.approx(round(nll3, 3))


def test_gibberish_scores_higher_than_common(spark):
    # rare tokens -> high perplexity; repeated common tokens -> low
    rows = [Row(doc_id=i, text="the cat sat on the mat") for i in range(20)]
    rows.append(Row(doc_id=99, text="zqx vrb plk wjn"))
    docs = spark.createDataFrame(rows)
    out = {r["doc_id"]: r["ppl"] for r in lm.unigram_perplexity(docs).collect()}
    assert out[99] > out[0] * 5


def test_perplexity_plan_broadcasts_vocab(spark):
    # the frequency table must reach the terms join as a broadcast —
    # a shuffled vocab join would put the hot-word skew on the exchange
    rows = [Row(doc_id=i, text="alpha beta gamma") for i in range(50)]
    docs = spark.createDataFrame(rows)
    plan = (
        lm.unigram_perplexity(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
