"""Column/DataFrame function library.

``text.py``        scalar text functions (sanitize chain, token counting,
                   quality scoring, language-ID heuristic, fingerprinting) —
                   pure pyspark.sql.functions chains, JVM-side, codegen-able.
``dedup.py``       deduplication family: exact, n-gram Jaccard, MinHash+LSH,
                   SimHash — relational formulations (explode/groupBy/join).
``similarity.py``  embedding similarity: brute-force cosine top-k + an
                   LSH-bucketed approximate variant.
``multimodal.py``  opaque-binary column plumbing with stubbed decoders.
``curate.py``      composed corpus-curation pipeline (dedup -> lang -> quality
                   -> token budget) and its per-stage funnel report, plus
                   sequence packing, deterministic hash sampling, and
                   Gopher-style repetition signals.
``incremental.py`` mergeable partial profiles (n/s/ss/min/max monoid
                   states) for cross-run aggregate maintenance.
``udfs.py``        the sanctioned Python-boundary rungs (scalar pandas_udf,
                   grouped-map applyInPandas) proven against value-exact
                   oracles.
``lm.py``          language-model scoring (unigram + bigram perplexity —
                   the CCNet/Gopher perplexity-filter stages, oracle-exact)
                   and BPE tokenizer training (one-iteration merge stats +
                   the full iterative merge loop).
``expectations.py``Deequ-style dataset contracts: declarative checks
                   verified in ONE combinable aggregation pass.
``drift.py``       PSI distribution-drift gate between corpus snapshots.
"""

from . import (
    curate,
    dedup,
    drift,
    expectations,
    incremental,
    lm,
    multimodal,
    similarity,
    text,
    udfs,
)

__all__ = [
    "text", "dedup", "incremental", "lm", "similarity", "multimodal",
    "curate", "udfs", "expectations", "drift",
]
