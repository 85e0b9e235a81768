"""Record linkage: blocked Jaro-Winkler fuzzy matching.

The reference pipeline matches attachment filenames against a whitelist
with exact regexes (/root/reference/src/services/attachment_service.py);
a web-scale curation pipeline needs the fuzzy generalization — "are these
two entity strings the same thing?" — for author/domain/source
canonicalization before dedup and mix weighting. The classic shape is
record linkage: BLOCK (cheap equi-key so candidate pairs are bounded),
then SCORE (an edit-similarity on the tiny within-block pair set), then
THRESHOLD.

Scale design (the whole point of blocking):
- Scoring runs over DISTINCT normalized names, never raw rows — at 100 TB
  the name vocabulary is orders of magnitude smaller than the row count,
  and the row->canonical mapping is a broadcastable dimension afterwards.
- Candidate pairs come from an equi-join on the block key (one shuffle,
  never a cross join), with a length-difference guard that is also a
  cheap JW upper-bound filter.
- ``max_block`` caps pathological blocks (the "Customer#..." common-prefix
  blow-up: one hot block with k names contributes k^2/2 pairs) the same
  way ``ngram_jaccard_pairs`` caps hot shingles. The cap is part of the
  operator's definition and mirrored by the oracle.
- The scorer is an Arrow-batched pandas UDF (pairs already pruned to the
  within-block survivors); its Python twin ``jaro_winkler_py`` is pinned
  value-exact against DuckDB's ``jaro_winkler_similarity`` in tests, so
  the oracle can verify the whole operator hash-for-hash.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def jaro_winkler_py(s1: str, s2: str) -> float:
    """Pure-Python Jaro-Winkler, value-exact twin of DuckDB's
    ``jaro_winkler_similarity`` (Winkler prefix boost p=0.1 over at most
    4 chars, applied only when Jaro > 0.7; empty string => 0.0 even
    against empty — fuzz-pinned in tests/test_linkage.py)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = i - window
        if lo < 0:
            lo = 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    jaro = (
        matches / l1 + matches / l2 + (matches - transpositions) / matches
    ) / 3.0
    if jaro > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        jaro += prefix * 0.1 * (1.0 - jaro)
    return jaro


@pandas_udf(DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler over candidate pairs. Per-row Python is
    unavoidable here (the match-window scan has data-dependent control
    flow no pandas str op expresses) but it runs only on the blocked,
    length-filtered pair set — the bounded survivor set, not the corpus."""
    return pd.Series(
        [jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype="float64"
    )


def jw_blocked_linkage(
    df: DataFrame,
    name_col: str,
    threshold: float = 0.85,
    block_chars: int = 2,
    max_len_diff: int = 2,
    max_block: int = 500,
) -> DataFrame:
    """Blocked Jaro-Winkler linkage over the DISTINCT normalized name
    vocabulary of ``name_col``.

    Returns (name_a, name_b, jw) with name_a < name_b, jw rounded to 6,
    only pairs sharing a block (first ``block_chars`` lowercase chars)
    with ``abs(len diff) <= max_len_diff`` and ``jw >= threshold``.
    Blocks larger than ``max_block`` names are dropped entirely (hot-key
    guard, part of the metric definition — see module docstring)."""
    names = (
        df.select(F.lower(F.trim(F.col(name_col))).alias("nm"))
        .filter(F.length("nm") > 0)
        .distinct()
        .withColumn("bk", F.substring("nm", 1, block_chars))
        .withColumn("ln", F.length("nm"))
    )
    if max_block > 0:
        # one tiny aggregate over the distinct-name table; the join back
        # is block-keyed and the counts side is broadcastable by size
        counts = names.groupBy("bk").agg(F.count("*").alias("bn"))
        names = names.join(
            F.broadcast(counts.filter(F.col("bn") <= max_block)), "bk"
        ).drop("bn")
    a = names.select(
        F.col("nm").alias("name_a"), F.col("bk"), F.col("ln").alias("la")
    )
    b = names.select(
        F.col("nm").alias("name_b"), F.col("bk"), F.col("ln").alias("lb")
    )
    pairs = a.join(b, "bk").filter(
        (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.col("la") - F.col("lb")) <= max_len_diff)
    )
    return (
        pairs.withColumn(
            "jw", F.round(jaro_winkler("name_a", "name_b"), 6)
        )
        .filter(F.col("jw") >= threshold)
        .select("name_a", "name_b", "jw")
    )


def linkage_canonicalize(
    df: DataFrame, name_col: str, pairs: DataFrame
) -> DataFrame:
    """Apply a linkage pair set back to the rows: every name maps to the
    lexicographically smallest name in its matched star (name_b -> min
    name_a over its pairs; unmatched names map to themselves). The
    mapping is a distinct-name-sized dimension — broadcast it, the corpus
    never shuffles."""
    mapping = pairs.groupBy(F.col("name_b").alias("nm")).agg(
        F.min("name_a").alias("canonical")
    )
    norm = F.lower(F.trim(F.col(name_col)))
    return (
        df.withColumn("nm", norm)
        .join(F.broadcast(mapping), "nm", "left")
        .withColumn(
            "canonical_name", F.coalesce("canonical", F.col("nm"))
        )
        .drop("nm", "canonical")
    )
