"""End-to-end corpus curation: the composed training-data pipeline the
brief treats as first-class — fingerprint dedup, then language gate, then
quality gate, then token budget, in the order that sheds the most data
with the least compute.

Stage order is a cost decision, not a semantic one:

1. **Fingerprint dedup first** — one shuffle on `md5(normalized text)`;
   at web scale duplicates are 30-60% of the corpus, so everything
   downstream runs on the survivors.
2. **Language + quality + token gates second** — all three are pure
   column expressions (`functions/text.py`, JVM builtins, no Python), so
   Catalyst fuses them into the post-shuffle stage; no extra pass.

Keep-min-id is the dedup winner rule (deterministic, matches
`dedup.exact_dedup`'s convention). The whole plan is ONE shuffle: the
window for keep-min and the gates share the fingerprint partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import text


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Returns surviving rows with the curation evidence columns:
    ``fingerprint, lang, n_tokens, quality`` (+ all original columns).
    A row survives iff it is the minimum-``id_col`` holder of its
    fingerprint AND its detected language is in ``langs`` AND
    ``quality >= min_quality`` AND ``min_tokens <= n_tokens <=
    max_tokens``."""
    c = F.col(text_col)
    annotated = docs.withColumn("fingerprint", text.fingerprint(c))
    w = Window.partitionBy("fingerprint")
    deduped = annotated.withColumn(
        "_keep", F.min(id_col).over(w)
    ).filter(F.col(id_col) == F.col("_keep")).drop("_keep")
    return (
        deduped.withColumn("lang", text.lang_id(c))
        .withColumn("n_tokens", text.token_count(c))
        .withColumn("quality", F.round(text.quality_score(c), 4))
        .filter(F.col("lang").isin(*langs))
        .filter(F.col("quality") >= F.lit(min_quality))
        .filter(
            (F.col("n_tokens") >= F.lit(min_tokens))
            & (F.col("n_tokens") <= F.lit(max_tokens))
        )
    )


def curation_funnel(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Per-stage survival counts (the curation report): how many rows each
    gate removed. One aggregation pass over the annotated frame — each row
    is labeled with the FIRST gate that drops it, so stages are disjoint
    and sum to the corpus size."""
    c = F.col(text_col)
    annotated = (
        docs.withColumn("fingerprint", text.fingerprint(c))
        .withColumn("_keep", F.min(id_col).over(Window.partitionBy("fingerprint")))
        .withColumn("lang", text.lang_id(c))
        .withColumn("n_tokens", text.token_count(c))
        .withColumn("quality", F.round(text.quality_score(c), 4))
    )
    stage = (
        F.when(F.col(id_col) != F.col("_keep"), F.lit("dup"))
        .when(~F.col("lang").isin(*langs), F.lit("lang"))
        .when(F.col("quality") < F.lit(min_quality), F.lit("low_quality"))
        .when(
            (F.col("n_tokens") < F.lit(min_tokens))
            | (F.col("n_tokens") > F.lit(max_tokens)),
            F.lit("token_bounds"),
        )
        .otherwise(F.lit("kept"))
    )
    return (
        annotated.withColumn("stage", stage)
        .groupBy("stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )
