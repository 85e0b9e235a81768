"""Language-model scoring for corpus curation: unigram perplexity.

Perplexity filtering is a standard LLM-training-data gate (CCNet / Gopher /
RefinedWeb style): score each document against a language model and drop
the tails — gibberish scores high, boilerplate scores suspiciously low.
Here the model is the corpus' own unigram distribution, which keeps the
whole operator inside exact, oracle-checkable SQL semantics (no external
model artifact) while exercising the same plan shape a KenLM-backed scorer
would need: tokenize -> explode -> frequency join -> per-doc aggregate.

Scale notes (100 TB): the token explode is map-side; the vocabulary table
is orders of magnitude smaller than the corpus and is broadcast here. At
web scale a full vocabulary may exceed broadcast limits — then split the
hot head (a few thousand words cover >90% of tokens: broadcast) from the
cold tail (shuffle equi-join; hot-key skew is exactly the salted-join
problem, see ``operators/salting.py:salted_equi_join``). The per-doc
aggregate is map-side combinable (avg of logs = sum+count).

All JVM builtins — ``split``/``explode``/``log``/``avg`` — no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_perplexity(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram negative log-likelihood and perplexity.

    Tokenization is lowercase + whitespace split (the safe common subset of
    Java regex and DuckDB's RE2, like ``text.py:TOKEN_PATTERN``). Final
    metrics are rounded (avg_nll to 3, ppl to 1) so the two engines'
    floating summation orders cannot flip a value hash.

    Returns (id_col, n_tokens, avg_nll, ppl), one row per document that
    has at least one token.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    terms = docs.select(F.col(id_col), F.explode(toks).alias("word"))
    freq = terms.groupBy("word").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").cast("double").alias("total"))
    nll = -F.avg(F.log(F.col("cnt") / F.col("total")))
    return (
        terms.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(nll, 3).alias("avg_nll"),
            F.round(F.exp(nll), 1).alias("ppl"),
        )
    )
