"""Bloom-filter semi-join reduction: prefilter a huge probe table against a
large build-side key set without broadcasting the keys themselves.

The resume operator (``resume.py``) broadcasts the completed-set keys — the
right plan while the key set is bounded (one row per partition bucket). At
100 TB the "seen" set can be billions of keys: too big to broadcast, and a
plain shuffle anti-join moves the ENTIRE probe table to the exchange. The
classic fix is a Bloom filter:

1. build a fixed-size bitmap over the build-side keys with a distributed
   ``bit_or`` aggregation (map-side combinable; the shuffle carries at most
   ``n_bits/64`` rows regardless of key count),
2. ship the bitmap to every task as ONE constant expression (size is chosen
   up front, not data-dependent — 2^27 bits is 16 MB and holds ~10M keys at
   ~1% false-positive rate with k=5; the 100 TB sizing knob is ``n_bits``),
3. prefilter the probe side MAP-SIDE: rows the filter rules out never reach
   the exchange. Only "maybe seen" candidates are shuffled for exact
   verification.

Results are EXACT — a Bloom filter has false positives, never false
negatives, so the definitely-unseen fast path is sound and the candidate
path re-checks with a real anti-join. That is why ``q_bloom_antijoin`` has
a plain ``NOT EXISTS`` DuckDB oracle despite the probabilistic structure.

Reference analog: the UNSEEN-only incremental scan
(``/root/reference/src/services/imap_service.py:136-210``) — "skip what is
already done", at a scale where the done-set no longer fits a broadcast.

Spark notes: Spark's own runtime Bloom pruning
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) only injects on
equi-joins whose creation side carries a selective filter, and never on
ANTI joins; an explicitly sized, explicitly owned bitmap is the portable,
plan-stable form. Everything here is JVM builtins (``xxhash64`` /
``bit_or`` / bitwise ops) — no Python in the hot path, and the membership
probe stays inside whole-stage codegen.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shl1(numbits: F.Column) -> F.Column:
    """``1L << numbits`` with a COLUMN shift amount — the ``F.shiftleft``
    wrapper only accepts a Python int, so go through ``call_function``."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), numbits)


def build_bloom(
    keys: DataFrame, key_col: str, n_bits: int = 1 << 20, n_hashes: int = 5
) -> list[int]:
    """Distributed Bloom build over ``keys[key_col]``.

    Each key sets ``n_hashes`` bits at ``xxhash64(i, key) mod n_bits``;
    bits are OR-combined per 64-bit word with ``bit_or`` (partial
    aggregation collapses the explode map-side, so the exchange carries at
    most ``n_bits/64`` rows no matter how many keys went in). Returns the
    dense bitmap as ``n_bits/64`` Python ints — small driver state by
    construction, like the IVF centroids (``similarity.py``).
    """
    if n_bits % 64 != 0:
        raise ValueError(f"n_bits ({n_bits}) must be a multiple of 64")
    n_words = n_bits // 64
    k = F.col(key_col)
    pairs = []
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.lit(i), k), F.lit(n_bits))
        pairs.append(
            F.struct(
                F.floor(pos / F.lit(64)).cast("int").alias("word"),
                _shl1(F.pmod(pos, F.lit(64)).cast("int")).alias("bit"),
            )
        )
    words = (
        keys.filter(k.isNotNull())
        .select(F.explode(F.array(*pairs)).alias("pb"))
        .groupBy(F.col("pb.word").alias("word"))
        .agg(F.bit_or(F.col("pb.bit")).alias("bits"))
        .collect()
    )
    dense = [0] * n_words
    for row in words:
        dense[row["word"]] = row["bits"]
    return dense


def might_contain(
    key: F.Column, bloom: list[int], n_bits: int, n_hashes: int = 5
) -> F.Column:
    """Membership probe as one codegen-friendly boolean expression.

    The bitmap ships as a SINGLE ``from_json`` string literal (one py4j
    call, constant-folded once — the ``_nested_lit`` lesson from
    ``similarity.py:554``: per-element ``F.lit`` would be n_words py4j
    round-trips). NULL keys: ``xxhash64`` hashes NULL to the seed value
    (it does NOT propagate NULL), so a NULL key probes like a constant —
    harmless for the join wrappers (the exact verify step never matches
    NULL, and ``build_bloom`` filters NULL keys out), but do not use this
    predicate alone where NULL must mean "unknown".
    """
    arr = F.from_json(F.lit(json.dumps(bloom)), "array<bigint>")
    checks = []
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.lit(i), key), F.lit(n_bits))
        word = F.element_at(arr, F.floor(pos / F.lit(64)).cast("int") + F.lit(1))
        bit = _shl1(F.pmod(pos, F.lit(64)).cast("int"))
        checks.append(word.bitwiseAND(bit) != F.lit(0).cast("long"))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_anti_join(
    probe: DataFrame,
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Exact ``probe LEFT ANTI JOIN keys`` with a Bloom prefilter.

    Rows whose key the filter rules out are kept map-side with NO shuffle;
    only false-positive candidates (plus true members, which get dropped)
    reach the exact anti-join exchange. NULL-keyed probe rows are kept —
    LEFT ANTI retains rows whose key matches nothing, and NULL equals
    nothing.

    Plan-shape trade-off, stated explicitly: the probe is SCANNED twice
    (miss branch + candidate branch), both scans map-only with the bloom
    predicate evaluated in codegen. That is the standard semi-join
    reduction bargain — an extra columnar scan (cheap, pruned, no
    network) buys removing the big side from the exchange (expensive:
    serialize + ship + spill every row). If the probe is itself an
    expensive subquery rather than a table scan, persist it first or fall
    back to the plain anti-join.
    """
    bloom = build_bloom(keys, key_col, n_bits, n_hashes)
    mc = might_contain(F.col(key_col), bloom, n_bits, n_hashes)
    definite_miss = probe.filter(~F.coalesce(mc, F.lit(False)))
    candidates = probe.filter(F.coalesce(mc, F.lit(False)))
    verified = candidates.join(
        keys.select(key_col).distinct(), on=key_col, how="left_anti"
    )
    return definite_miss.unionByName(verified.select(*probe.columns))


def bloom_semi_join(
    probe: DataFrame,
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Exact ``probe LEFT SEMI JOIN keys`` with a Bloom prefilter: the
    definitely-absent rows are dropped map-side before the shuffle, and the
    surviving candidates are verified with a real semi-join (false
    positives must not leak through)."""
    bloom = build_bloom(keys, key_col, n_bits, n_hashes)
    mc = might_contain(F.col(key_col), bloom, n_bits, n_hashes)
    candidates = probe.filter(F.coalesce(mc, F.lit(False)))
    return candidates.join(
        keys.select(key_col).distinct(), on=key_col, how="left_semi"
    )
