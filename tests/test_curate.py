"""Curation pipeline invariants: the funnel stages partition the corpus,
and the 'kept' bucket is exactly the curate_corpus survivor set."""

import pytest
from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.functions import curate

SF_DIR = "/root/testdata/sf0.001"
KW = dict(langs=("en",), min_quality=0.3, min_tokens=10, max_tokens=100_000)


def test_funnel_partitions_corpus(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    funnel = curate.curation_funnel(d, **KW)
    rows = {r["stage"]: r["n_docs"] for r in funnel.collect()}
    assert sum(rows.values()) == d.count()
    survivors = curate.curate_corpus(d, **KW)
    assert rows.get("kept", 0) == survivors.count()


def test_survivors_pass_all_gates(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = curate.curate_corpus(d, **KW)
    bad = s.filter(
        (F.col("lang") != "en")
        | (F.col("quality") < 0.3)
        | (F.col("n_tokens") < 10)
        | (F.col("n_tokens") > 100_000)
    )
    assert bad.count() == 0
    # dedup: one survivor per fingerprint, and it is the min doc_id
    per_fp = s.groupBy("fingerprint").agg(F.count("*").alias("n"))
    assert per_fp.filter(F.col("n") > 1).count() == 0


def test_sequence_pack_offsets(spark):
    """Offset-based chunking: doc lands in the sequence its start offset
    falls in; oversized docs keep their starting sequence."""
    rows = [("s", 1, 800), ("s", 2, 800), ("s", 3, 800),  # 0,800,1600
            ("s", 4, 5000),                               # starts 2400 -> seq 1
            ("s", 5, 100),                                # starts 7400 -> seq 3
            ("t", 1, 10)]
    df = spark.createDataFrame(rows, "source string, doc_id int, n_tok long")
    out = curate.sequence_pack(df, "source", "doc_id", "n_tok", 2000)
    got = {(r["source"], r["doc_id"]): r["seq_idx"] for r in out.collect()}
    assert got == {("s", 1): 0, ("s", 2): 0, ("s", 3): 0,
                   ("s", 4): 1, ("s", 5): 3, ("t", 1): 0}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curate.sequence_pack(df, "source", "doc_id", "n_tok", 0)


def test_hash_sample_deterministic_and_monotone(spark):
    """Same row -> same fate across runs and corpus growth; larger
    numerator keeps a superset."""
    import pytest as _pytest
    d = spark.range(1000).withColumnRenamed("id", "doc_id")
    k3 = set(r["doc_id"] for r in
             d.filter(curate.hash_sample(d, "doc_id", 3, 10)).collect())
    k3b = set(r["doc_id"] for r in
              d.filter(curate.hash_sample(d, "doc_id", 3, 10)).collect())
    k7 = set(r["doc_id"] for r in
             d.filter(curate.hash_sample(d, "doc_id", 7, 10)).collect())
    assert k3 == k3b
    assert k3 <= k7
    assert 0.2 < len(k3) / 1000 < 0.4  # ~30%
    # growth never flips an existing row's fate
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    kbig = set(r["doc_id"] for r in
               big.filter(curate.hash_sample(big, "doc_id", 3, 10)).collect())
    assert k3 == {i for i in kbig if i < 1000}
    with _pytest.raises(ValueError):
        curate.hash_sample(d, "doc_id", 5, 0)
    with _pytest.raises(ValueError):
        curate.hash_sample(d, "doc_id", 11, 10)


def test_cap_per_group_correct_and_plan(spark):
    """cap_per_group keeps exactly the best-k per group under a total
    order, and the physical plan carries WindowGroupLimit — the partial
    top-k that runs before the shuffle (the reason the window form is
    skew-safe at scale)."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    k = 3
    capped = curate.cap_per_group(
        d, "source", [F.col("n_chars").desc(), F.col("doc_id").asc()], k=k
    )
    rows = capped.collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["source"], []).append(r)
    base = d.collect()
    for src, got in per_group.items():
        want = sorted(
            (r for r in base if r["source"] == src),
            key=lambda r: (-r["n_chars"], r["doc_id"]),
        )[:k]
        assert sorted(r["doc_id"] for r in got) == sorted(
            r["doc_id"] for r in want
        )
        assert sorted(r["rn"] for r in got) == list(range(1, len(want) + 1))
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan

    import pytest

    with pytest.raises(ValueError):
        curate.cap_per_group(d, "source", [F.col("doc_id")], k=0)


def test_nfc_normalize_matches_unicodedata(spark):
    import unicodedata

    from png_from_pdf_extracter_spark.functions import udfs

    samples = [
        "café",              # decomposed acute -> composed
        "résumé",
        "already composed café",
        "ascii only",
        "ṩ",                  # s with dot below and dot above
        "ṩ",           # same, decomposed (NFC-equivalent)
        "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["t"])
    got = {
        r["t"]: r["n"]
        for r in df.select(
            "t", udfs.nfc_normalize("t").alias("n")
        ).collect()
    }
    for s in samples:
        assert got[s] == unicodedata.normalize("NFC", s)


def test_source_mix_weights_uniform_and_explicit(spark):
    rows = [("a", 600), ("a", 150), ("b", 150), ("c", 100)]
    d = spark.createDataFrame(rows, ["source", "n_tokens"])
    out = {
        r["source"]: r
        for r in curate.source_mix_weights(d, "source", "n_tokens").collect()
    }
    # totals: a=750 b=150 c=100, total=1000, uniform target 1/3
    assert out["a"]["tokens"] == 750
    assert abs(out["a"]["actual_share"] - 0.75) < 1e-9
    assert abs(out["a"]["weight"] - (1 / 3) / 0.75) < 1e-6
    assert abs(out["c"]["weight"] - (1 / 3) / 0.10) < 1e-6
    # explicit targets override uniform
    tgt = {"a": 0.5, "b": 0.25, "c": 0.25}
    out2 = {
        r["source"]: r
        for r in curate.source_mix_weights(
            d, "source", "n_tokens", target_shares=tgt
        ).collect()
    }
    assert abs(out2["b"]["target_share"] - 0.25) < 1e-9
    assert abs(out2["b"]["weight"] - 0.25 / 0.15) < 1e-6
    # targets must sum to 1
    import pytest

    with pytest.raises(ValueError):
        curate.source_mix_weights(
            d, "source", "n_tokens", target_shares={"a": 0.5}
        )


def test_dedup_lines_first_occurrence_order(spark):
    from png_from_pdf_extracter_spark.functions import curate

    df = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb"),
            (2, "x\ny"),
            (3, ""),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_unique_lines"], r["cleaned_text"])
        for r in curate.dedup_lines(df).collect()
    }
    assert got[1] == (5, 3, "a\nb\nc")  # first occurrences, original order
    assert got[2] == (2, 2, "x\ny")  # nothing repeats -> pass-through
    assert got[3] == (1, 1, "")  # empty doc: one empty line, kept


def test_hashed_linear_score_deterministic_and_bounded(spark):
    from png_from_pdf_extracter_spark.functions import curate

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha  beta   gamma"), (3, "   ")],
        "doc_id int, text string",
    )
    out = df.select(
        "doc_id", curate.hashed_linear_score("text").alias("s")
    )
    got = {r["doc_id"]: r["s"] for r in out.collect()}
    # whitespace-normalization invariance: same tokens -> same score
    assert got[1] == got[2]
    assert -1.0 <= got[1] <= 1.0
    assert got[3] == 0.0  # token-free text scores the neutral 0
    # engine determinism: a second evaluation bit-matches
    again = {r["doc_id"]: r["s"] for r in out.collect()}
    assert got == again


def test_repetition_signals_hand_computed(spark):
    # doc 1 "a b a b a": 2-grams [ab,ba,ab,ba] -> total 4, distinct 2,
    # top 2 => dup=0.5 top=0.5; 3-grams [aba,bab,aba] -> total 3,
    # distinct 2, top 2 => dup=0.3333 top=0.6667.
    # doc 2 "a b c" (exactly 3 tokens): ONE 3-gram — guards the zip_with
    # null-tail slice; all-distinct 2-grams.
    d = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b c")], ["doc_id", "text"]
    )
    out = {
        r["id"]: r
        for r in curate.repetition_signals(
            d, max_dup_frac=0.4, max_top_frac=0.6
        ).collect()
    }
    r1, r2 = out[1], out[2]
    assert r1["dup_2gram_frac"] == 0.5
    assert r1["top_2gram_frac"] == 0.5
    assert r1["dup_3gram_frac"] == 0.3333
    assert r1["top_3gram_frac"] == 0.6667
    assert r1["passes"] is False  # dup_2gram 0.5 > 0.4
    assert r2["dup_2gram_frac"] == 0.0
    assert r2["top_2gram_frac"] == 0.5
    assert r2["dup_3gram_frac"] == 0.0
    assert r2["top_3gram_frac"] == 1.0  # the single 3-gram, no null tail
    assert r2["passes"] is False  # top_3gram 1.0 > 0.6


def test_repetition_signals_clean_doc_passes(spark):
    # 30 distinct words -> every 2-/3-gram unique: dup=0, top=1/29, 1/28
    words = " ".join(f"w{i}" for i in range(30))
    d = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    row = curate.repetition_signals(d).collect()[0]
    assert row["dup_2gram_frac"] == 0.0
    assert row["dup_3gram_frac"] == 0.0
    assert row["passes"] is True


def test_materialize_mix_uniform_shares(spark):
    # source a: 9000 chars over 90 docs; b: 3000 over 30; c: 1000 over 10
    # uniform target (1/3 each): budget B = min(T_s * 3) = 3000
    # rates: a = 1000/9000 = 0.111, b = 1000/3000 = 0.333, c = 1.0
    rows = (
        [(i, "a", 100) for i in range(90)]
        + [(1000 + i, "b", 100) for i in range(30)]
        + [(2000 + i, "c", 100) for i in range(10)]
    )
    d = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    kept = curate.materialize_mix(d, "source", "n_chars")
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["c"] == 10  # bottleneck source keeps everything
    # hash sampling is approximate at tiny n; bounds are generous
    assert 3 <= by_src["a"] <= 20
    assert 4 <= by_src["b"] <= 18
    assert kept.columns == d.columns


def test_materialize_mix_deterministic_and_explicit_shares(spark):
    rows = [(i, "a" if i % 2 else "b", 50) for i in range(200)]
    d = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    shares = {"a": 0.8, "b": 0.2}
    k1 = sorted(r["doc_id"] for r in
                curate.materialize_mix(d, "source", "n_chars",
                                       shares=shares).collect())
    k2 = sorted(r["doc_id"] for r in
                curate.materialize_mix(d, "source", "n_chars",
                                       shares=shares).collect())
    assert k1 == k2  # md5 predicate: no RNG state
    # source missing from shares is dropped entirely
    k3 = curate.materialize_mix(d, "source", "n_chars", shares={"a": 1.0})
    assert {r["source"] for r in k3.collect()} == {"a"}


def test_materialize_mix_temperature_boosts_small_sources(spark):
    # a: 10000 chars, b: 100 chars. alpha=0.5: w_a ∝ 100, w_b ∝ 10 —
    # the small source's SHARE rises from ~1% natural to ~9% target,
    # so 'b' keeps everything (bottleneck) while 'a' downsamples
    rows = [(i, "a", 100) for i in range(100)] + [
        (1000 + i, "b", 10) for i in range(10)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    kept = curate.materialize_mix(d, "source", "n_chars", alpha=0.5)
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["b"] == 10  # boosted small source keeps all
    assert by_src["a"] < 100  # damped big source downsamples
    with pytest.raises(ValueError):
        curate.materialize_mix(
            d, "source", "n_chars", shares={"a": 1.0}, alpha=0.5
        )


def test_split_assign_deterministic_partition_and_rates(spark):
    """Every row gets exactly one of train/val/test, the assignment is a
    pure function of the id (stable under union/repartition), salt
    derives an independent family, and rates land near the targets."""
    d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = d.withColumn("split", curate.split_assign("doc_id"))
    by = {r["split"]: r["n"] for r in
          out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(by) == {"train", "val", "test"}
    assert sum(by.values()) == 2000
    # hash-uniformity at n=2000: each 10% slice within a loose band
    assert 130 <= by["val"] <= 270 and 130 <= by["test"] <= 270
    # determinism: same ids, different partitioning -> identical map
    again = {
        r["doc_id"]: r["split"]
        for r in d.repartition(7).withColumn(
            "split", curate.split_assign("doc_id")
        ).collect()
    }
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert again == first
    # salt changes assignments but not the partition property
    salted = {
        r["doc_id"]: r["split"]
        for r in d.withColumn(
            "split", curate.split_assign("doc_id", salt="exp2")
        ).collect()
    }
    assert salted != first
    with pytest.raises(ValueError):
        curate.split_assign("doc_id", val_pct=60, test_pct=60)


def test_word_entropy_hand_computed(spark):
    """Closed-form pins: uniform distribution -> log2(n) bits; constant
    doc -> 0 bits; 3:1 mix -> 2 - 0.75*log2(3) bits."""
    import math

    rows = [
        (0, "a b c d"),          # uniform over 4 -> exactly 2.0
        (1, "x x x x"),          # single symbol -> 0.0
        (2, "y y y z"),          # H = 2 - 0.75*log2(3)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy_bits"])
        for r in curate.word_entropy(d).collect()
    }
    assert got[0] == (4, 4, 2.0)
    assert got[1] == (4, 1, 0.0)
    exp2 = math.floor((2 - 0.75 * math.log2(3)) * 10000) / 10000
    assert got[2] == (4, 2, exp2)


# --------------------------------------------------------- chunk_sliding

def test_chunk_sliding_hand_computed(spark):
    """100 tokens, size 50 stride 40 -> starts 0/40/80, lengths 50/50/20;
    consecutive chunks share exactly 10 tokens of overlap."""
    toks = [f"t{i}" for i in range(100)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        curate.chunk_sliding(df, size=50, stride=40).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["chunk_idx"], r["start"], r["n_chunk_tokens"]) for r in rows] == [
        (0, 0, 50), (1, 40, 50), (2, 80, 20),
    ]
    import hashlib

    assert rows[1]["chunk_fp"] == hashlib.md5(
        " ".join(toks[40:90]).encode()
    ).hexdigest()


def test_chunk_sliding_covers_every_token(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n)))
         for i, n in enumerate([1, 39, 40, 41, 130])],
        "doc_id long, text string",
    )
    rows = curate.chunk_sliding(df, size=50, stride=40).collect()
    covered = {}
    for r in rows:
        covered.setdefault(r["doc_id"], set()).update(
            range(r["start"], r["start"] + r["n_chunk_tokens"])
        )
    assert covered == {0: {0}, 1: set(range(39)), 2: set(range(40)),
                       3: set(range(41)), 4: set(range(130))}


def test_chunk_sliding_empty_doc_emits_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one")], "doc_id long, text string"
    )
    rows = curate.chunk_sliding(df).collect()
    assert {r["doc_id"] for r in rows} == {3}


def test_chunk_sliding_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        curate.chunk_sliding(df, stride=0)


# ------------------------------------------------------ boilerplate_strip

def test_boilerplate_strip_hand_computed(spark):
    """The shared header/footer lines (df=3) vanish everywhere; unique
    body lines survive byte-identically and in order."""
    hdr, ftr = "SUBSCRIBE NOW", "ALL RIGHTS RESERVED"
    docs = [
        (1, f"{hdr}\nunique one\n{ftr}"),
        (2, f"{hdr}\nunique two a\nunique two b\n{ftr}"),
        (3, f"{hdr}\nunique three\n{ftr}"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in curate.boilerplate_strip(df, max_line_df=2).collect()
    }
    assert out[1]["clean_text"] == "unique one"
    assert out[2]["clean_text"] == "unique two a\nunique two b"
    assert out[2]["n_kept"] == 2 and out[2]["n_dropped"] == 2
    assert out[3]["n_dropped"] == 2


def test_boilerplate_strip_all_boilerplate_doc_survives_empty(spark):
    docs = [(i, "SAME LINE") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = curate.boilerplate_strip(df, max_line_df=2).collect()
    assert len(out) == 5
    assert all(r["clean_text"] == "" and r["n_kept"] == 0 for r in out)


def test_boilerplate_strip_threshold_is_distinct_docs_not_rows(spark):
    # the same line twice in ONE doc counts df=1 -> kept both times
    df = spark.createDataFrame(
        [(1, "repeat\nrepeat\nother")], "doc_id long, text string"
    )
    r = curate.boilerplate_strip(df, max_line_df=1).collect()[0]
    assert r["clean_text"] == "repeat\nrepeat\nother"


# ------------------------------------------------------ source_similarity

def test_source_similarity_hand_computed(spark):
    import math

    docs = [
        ("a", "x x y"),   # tf a: x2 y1 -> n2 = 5
        ("b", "x y y"),   # tf b: x1 y2 -> n2 = 5
        ("c", "z"),       # orthogonal
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    out = {
        (r["src1"], r["src2"]): r
        for r in curate.source_similarity(df).collect()
    }
    # dot(a,b) = 2*1 + 1*2 = 4 ; cos = 4/5 — pinned via the emitter's own
    # expression (sqrt(5)*sqrt(5) = 5.000000000000001 in IEEE, so the
    # floor-6dp value is 0.799999, identically on every engine)
    assert out[("a", "b")]["dot"] == 4
    assert out[("a", "b")]["cos_q"] == math.floor(
        4 / (math.sqrt(5) * math.sqrt(5)) * 1e6
    ) / 1e6
    # c shares no terms: pair absent (dot would be 0)
    assert ("a", "c") not in out and ("b", "c") not in out


def test_source_similarity_identical_sources_cosine_one(spark):
    df = spark.createDataFrame(
        [("a", "p q r"), ("b", "p q r")], "source string, text string"
    )
    r = curate.source_similarity(df).collect()[0]
    assert r["cos_q"] == 1.0


# ---- k-anonymity ----

from png_from_pdf_extracter_spark.functions.curate import (  # noqa: E402
    k_anonymity_report,
    suppress_rare_combos,
)


def test_k_anonymity_report_counts(spark):
    df = spark.createDataFrame(
        [("en", "web")] * 5 + [("en", "book")] * 2 + [("de", "web")],
        "lang string, source string",
    )
    rows = {
        (r["lang"], r["source"]): r
        for r in k_anonymity_report(df, ("lang", "source"), k=3).collect()
    }
    assert rows[("en", "web")]["n"] == 5
    assert rows[("en", "web")]["at_risk"] is False
    assert rows[("en", "book")]["at_risk"] is True
    assert rows[("de", "web")]["at_risk"] is True


def test_suppress_rare_combos_drops_exactly_risky_rows(spark):
    df = spark.createDataFrame(
        [("en", "web", i) for i in range(5)]
        + [("en", "book", 10), ("en", "book", 11), ("de", "web", 20)],
        "lang string, source string, id long",
    )
    kept = suppress_rare_combos(df, ("lang", "source"), k=3).collect()
    assert {r["id"] for r in kept} == set(range(5))
    # k=1 keeps everything; schema unchanged
    all_kept = suppress_rare_combos(df, ("lang", "source"), k=1)
    assert all_kept.count() == 8
    assert all_kept.columns == df.columns
    import pytest

    with pytest.raises(ValueError):
        k_anonymity_report(df, (), k=3)
    with pytest.raises(ValueError):
        suppress_rare_combos(df, ("lang",), k=0)


# ---- negative_sample ----

from png_from_pdf_extracter_spark.functions.curate import (  # noqa: E402
    negative_sample,
)


def test_negative_sample_excludes_anchor_and_positives(spark):
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3)], "anchor_id long, pos_id long"
    )
    out = negative_sample(pairs, n_items=10, k=3).collect()
    by_a = {}
    for r in out:
        by_a.setdefault(r["anchor_id"], set()).add(r["neg_id"])
    assert set(by_a) == {0, 1}
    assert by_a[0].isdisjoint({0, 1, 2})
    assert by_a[1].isdisjoint({1, 3})
    assert all(len(v) <= 3 for v in by_a.values())
    assert all(0 <= n < 10 for v in by_a.values() for n in v)


def test_negative_sample_deterministic_across_partitioning(spark):
    pairs = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)],
        "anchor_id long, pos_id long",
    )
    a = sorted(map(tuple, negative_sample(pairs, 50, k=4).collect()))
    b = sorted(
        map(tuple, negative_sample(pairs.repartition(7), 50, k=4).collect())
    )
    assert a == b
    # ~k negatives per anchor on a roomy universe
    from collections import Counter

    cnt = Counter(t[0] for t in a)
    assert all(c == 4 for c in cnt.values())


def test_negative_sample_exhausted_universe_yields_fewer(spark):
    # universe {0,1,2}; anchor 0 has positives {1,2} -> zero legal negs
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2)], "anchor_id long, pos_id long"
    )
    out = negative_sample(pairs, n_items=3, k=2, oversample=10).collect()
    assert out == []
    import pytest

    with pytest.raises(ValueError):
        negative_sample(pairs, n_items=1)
    with pytest.raises(ValueError):
        negative_sample(pairs, n_items=10, k=0)


# ---- ngram_commonness ----


def test_ngram_commonness_template_vs_fresh(spark):
    from png_from_pdf_extracter_spark.functions.curate import (
        ngram_commonness,
    )

    # five docs share the template trigrams; one is fresh text
    template = "all rights reserved contact us today"
    rows = [(i, template) for i in range(5)] + [
        (9, "completely novel musings about ducks")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in ngram_commonness(df, n=3, common_df=5).collect()
    }
    # template docs: every one of their 4 trigrams appears in 5 docs
    assert out[0]["n_shingles"] == 4 and out[0]["n_common"] == 4
    assert out[0]["common_ppm"] == 1_000_000
    # the fresh doc shares nothing
    assert out[9]["n_common"] == 0 and out[9]["common_ppm"] == 0


def test_ngram_commonness_partial_and_short_docs_drop(spark):
    from png_from_pdf_extracter_spark.functions.curate import (
        ngram_commonness,
    )

    rows = [
        (1, "a b c d"),   # trigrams: 'a b c', 'b c d'
        (2, "a b c x"),   # shares 'a b c'
        (3, "a b"),       # too short for n=3: drops out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in ngram_commonness(df, n=3, common_df=2).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_shingles"] == 2 and out[1]["n_common"] == 1
    assert out[1]["common_ppm"] == 500_000  # floor(1e6 * 1/2)


# ---- leakage_free_split ----


def test_leakage_free_split_never_straddles(spark):
    """Every near-dup pair lands in ONE split; the naive per-doc split
    provably straddles on the same corpus (the bug this op removes)."""
    from png_from_pdf_extracter_spark.functions import curate

    # 30 clusters of 3 identical docs: ids (i, 1000+i, 2000+i)
    rows = []
    for i in range(30):
        text = f"cluster {i} body repeated tokens " + ("xyz " * 10)
        for base in (0, 1000, 2000):
            rows.append((base + i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(i, 1000 + i) for i in range(30)]
        + [(i, 2000 + i) for i in range(30)],
        "id1 long, id2 long",
    )
    out = curate.leakage_free_split(docs, pairs).select(
        "doc_id", "group_key", "split"
    )
    got = {r.doc_id: (r.group_key, r.split) for r in out.collect()}
    for i in range(30):
        assert got[i] == got[1000 + i] == got[2000 + i] == (i, got[i][1])
    # naive per-doc split DOES straddle at least one cluster here
    naive = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", curate.split_assign("doc_id").alias("s")
        ).collect()
    }
    assert any(
        len({naive[i], naive[1000 + i], naive[2000 + i]}) > 1
        for i in range(30)
    )


def test_leakage_free_split_singletons_self_keyed(spark):
    from png_from_pdf_extracter_spark.functions import curate

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "id1 long, id2 long")
    got = {
        r.doc_id: (r.group_key, r.split)
        for r in curate.leakage_free_split(docs, pairs).collect()
    }
    # singleton group key = own id -> identical to split_assign(doc_id)
    naive = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", curate.split_assign("doc_id").alias("s")
        ).collect()
    }
    assert got == {1: (1, naive[1]), 2: (2, naive[2])}


# ---- good_turing ----


def test_good_turing_hand_computed(spark):
    """Counts: a=3, b=2, c=2, d=1, e=1, f=1 -> N_1=3, N_2=2, N_3=1;
    r*=  r=1: 2*N_2/N_1 = 4/3;  r=2: 3*N_3/N_2 = 1.5;  r=3: 4*0/1 = 0."""
    from png_from_pdf_extracter_spark.functions.lm import good_turing

    docs = spark.createDataFrame(
        [(1, "a a a b b c c d e f")], "doc_id long, text string"
    )
    got = {
        r.r: (r.n_r, r.r_star)
        for r in good_turing(docs, "text", n=1).collect()
    }
    assert got == {
        1: (3, round(2 * 2 / 3, 6)),
        2: (2, 1.5),
        3: (1, 0.0),
    }


def test_good_turing_bigrams_match_unigram_path_shape(spark):
    from png_from_pdf_extracter_spark.functions.lm import good_turing

    docs = spark.createDataFrame(
        [(1, "x y x y z"), (2, "x y q")], "doc_id long, text string"
    )
    # bigrams: "x y"x3, "y x"x1, "y z"x1, "y q"x1 -> N_1=3, N_3=1
    got = {
        r.r: (r.n_r, r.r_star)
        for r in good_turing(docs, "text", n=2).collect()
    }
    assert got == {1: (3, 0.0), 3: (1, 0.0)}
    # unseen-mass estimate N_1/N = 3/6 is readable straight off the table
    assert got[1][0] == 3


# ---- compression_ratio ----


def test_compression_ratio_separates_template_from_noise(spark):
    import zlib

    from png_from_pdf_extracter_spark.functions import curate

    template = "the same line repeated verbatim " * 60
    noise = "k9x2 qv7w zzp1 m4rj t8yl c3hd w6fn b5gs " * 5
    # make noise actually incompressible-ish: unique token soup
    noise = " ".join(f"w{i}x{i * 7 % 97}" for i in range(200))
    df = spark.createDataFrame(
        [(1, template), (2, noise), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in curate.compression_ratio(df).collect()}
    assert got[1].ratio < 0.1 < got[2].ratio
    # exact value pin: pure function of the bytes
    raw = template.encode()
    assert got[1].z_bytes == len(zlib.compress(raw, 6))
    assert got[1].n_bytes == len(raw)
    assert got[3].ratio is None and got[4].ratio is None


def test_compression_ratio_deterministic_across_runs(spark):
    from png_from_pdf_extracter_spark.functions import curate

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        (r.doc_id, r.ratio) for r in curate.compression_ratio(df).collect()
    )
    b = sorted(
        (r.doc_id, r.ratio)
        for r in curate.compression_ratio(df.repartition(7)).collect()
    )
    assert a == b


# ---- l-diversity ----

from png_from_pdf_extracter_spark.functions.curate import (  # noqa: E402
    l_diversity_report,
)


def test_l_diversity_flags_homogeneous_combo(spark):
    rows = [
        ("us", "a", "flu"),
        ("us", "a", "flu"),
        ("us", "a", "flu"),  # 3 rows, 1 sensitive value -> at risk
        ("de", "b", "flu"),
        ("de", "b", "cold"),  # 2 distinct -> diverse at l=2
    ]
    df = spark.createDataFrame(rows, "geo string, seg string, dx string")
    out = {
        (r["geo"], r["seg"]): r
        for r in l_diversity_report(df, ("geo", "seg"), "dx", l=2).collect()
    }
    assert out[("us", "a")]["at_risk"] is True
    assert out[("us", "a")]["n"] == 3 and out[("us", "a")]["n_sensitive"] == 1
    assert out[("de", "b")]["at_risk"] is False


def test_l_diversity_param_validation(spark):
    import pytest

    df = spark.createDataFrame([("a", "b")], "q string, s string")
    with pytest.raises(ValueError):
        l_diversity_report(df, (), "s", l=2)
    with pytest.raises(ValueError):
        l_diversity_report(df, ("q",), "s", l=0)


# ---- span corruption plan ----

from png_from_pdf_extracter_spark.functions.curate import (  # noqa: E402
    span_corruption_plan,
)


def test_span_corruption_counts_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, 400), (2, 19), (3, 133)], "doc_id long, n_chars long"
    )
    out = span_corruption_plan(
        df, mask_permille=150, span_len=20
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 1: floor(400*150/20000) = 3 spans; doc 2 too short; doc 3: 0
    assert set(by_doc) == {1}
    assert len(by_doc[1]) == 3
    for r in by_doc[1]:
        assert 0 <= r["start"] <= 400 - 20 and r["length"] == 20


def test_span_corruption_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [(i, 500 + i) for i in range(50)], "doc_id long, n_chars long"
    )
    a = sorted(map(tuple, span_corruption_plan(df).collect()))
    b = sorted(
        map(tuple, span_corruption_plan(df.repartition(7)).collect())
    )
    assert a == b and len(a) > 0


def test_span_corruption_param_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 100)], "doc_id long, n_chars long")
    with pytest.raises(ValueError):
        span_corruption_plan(df, mask_permille=0)
    with pytest.raises(ValueError):
        span_corruption_plan(df, span_len=0)


def test_span_corruption_mask_fraction_close_to_target(spark):
    df = spark.createDataFrame([(1, 10000)], "doc_id long, n_chars long")
    out = span_corruption_plan(
        df, mask_permille=150, span_len=20
    ).collect()
    masked = len(out) * 20
    assert abs(masked / 10000 - 0.15) < 0.01


# ---- script profile ----

from png_from_pdf_extracter_spark.functions.text import (  # noqa: E402
    script_profile,
)


def test_script_profile_counts_and_dominant(spark):
    rows = [
        (1, "hello мир 123"),          # 5 latin, 3 cyrillic, 3 digit
        (2, "привет"),                  # cyrillic only
        (3, "日本語テスト"),             # cjk (kanji + katakana)
        (4, "!!! ???"),                 # none
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert out[1]["n_latin"] == 5 and out[1]["n_cyrillic"] == 3
    assert out[1]["n_digit"] == 3 and out[1]["dominant"] == "latin"
    assert out[2]["dominant"] == "cyrillic" and out[2]["n_cyrillic"] == 6
    assert out[3]["dominant"] == "cjk" and out[3]["n_cjk"] == 6
    assert out[4]["dominant"] == "none"
    assert out[4]["n_other"] == 6  # punctuation


def test_script_profile_tie_prefers_latin(spark):
    df = spark.createDataFrame([(1, "abмы")], "doc_id long, text string")
    r = script_profile(df).collect()[0]
    assert r["n_latin"] == 2 and r["n_cyrillic"] == 2
    assert r["dominant"] == "latin"


def test_script_profile_totals_partition(spark):
    df = spark.createDataFrame(
        [(1, "mixed text с цифрами 42 and 日本")],
        "doc_id long, text string",
    )
    r = script_profile(df).collect()[0]
    parts = (
        r["n_latin"] + r["n_cyrillic"] + r["n_greek"] + r["n_arabic"]
        + r["n_devanagari"] + r["n_cjk"] + r["n_hangul"]
        + r["n_digit"] + r["n_space"] + r["n_other"]
    )
    assert parts == r["n_chars_total"]


def test_t_closeness_identical_distributions_zero(spark):
    from png_from_pdf_extracter_spark.functions.curate import (
        t_closeness_report,
    )

    # every combo carries the same value multiset -> EMD to global = 0
    rows = [(g, v) for g in ("a", "b", "c") for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = t_closeness_report(df, ("g",), "v", t=0.1).collect()
    assert len(out) == 3
    assert all(r["t_q6"] == 0.0 and not r["at_risk"] for r in out)


def test_t_closeness_concentrated_combo_flagged(spark):
    from png_from_pdf_extracter_spark.functions.curate import (
        t_closeness_report,
    )

    # combo "rich" holds only the top value, "poor" only the bottom;
    # global is the 50/50 mix -> each is 0.5 value-units away
    rows = [("rich", 10)] * 5 + [("poor", 9)] * 5
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["g"]: r
        for r in t_closeness_report(df, ("g",), "v", t=0.2).collect()
    }
    assert out["rich"]["t_q6"] == 0.5 and out["rich"]["at_risk"]
    assert out["poor"]["t_q6"] == 0.5 and out["poor"]["at_risk"]


def test_t_closeness_python_twin(spark):
    import math
    import random

    from png_from_pdf_extracter_spark.functions.curate import (
        t_closeness_report,
    )

    rng = random.Random(3)
    rows = [
        (rng.choice("abcd"), rng.randint(0, 15)) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: r["t_q6"]
        for r in t_closeness_report(df, ("g",), "v").collect()
    }
    vals = sorted({v for _, v in rows})
    nn = len(rows)
    for g in "abcd":
        ng = sum(1 for x, _ in rows if x == g)
        cum_g = cum_t = 0
        emd = 0
        prev = None
        for v in vals:
            if prev is not None:
                emd += abs(cum_g * nn - cum_t * ng) * (v - prev)
            cum_g += sum(1 for x, y in rows if x == g and y == v)
            cum_t += sum(1 for _, y in rows if y == v)
            prev = v
        assert got[g] == math.floor(emd / (ng * nn) * 1e6) / 1e6


def test_t_closeness_validates(spark):
    import pytest as _pytest

    from png_from_pdf_extracter_spark.functions.curate import (
        t_closeness_report,
    )

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with _pytest.raises(ValueError):
        t_closeness_report(df, (), "v")


def test_mojibake_roundtrip_detection(spark):
    from png_from_pdf_extracter_spark.functions.text import (
        encoding_health,
        mojibake_marks,
    )

    clean = "A perfectly ordinary sentence, with punctuation."
    moji2 = "café résumé".encode("utf-8").decode("cp1252")
    moji3 = "it’s — fine…".encode("utf-8").decode("cp1252")
    c1 = "it’s".encode("utf-8").decode("latin-1")
    repl = "lost � bytes � here"
    df = spark.createDataFrame(
        [(1, clean), (2, moji2), (3, moji3), (4, c1), (5, repl)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", mojibake_marks("text"), *encoding_health("text")
        ).collect()
    }
    assert not out[1]["enc_suspect"]
    # three 2-byte sequences (one é in café, two in résumé) -> 3 marks
    assert out[2]["moji_marks"] == 3 and out[2]["enc_suspect"]
    # three 3-byte punctuation sequences (’, —, …) -> 3 marks
    assert out[3]["moji_marks"] == 3 and out[3]["enc_suspect"]
    # latin-1 decode leaves C1 controls, not cp1252 symbols
    assert out[4]["c1_chars"] == 2 and out[4]["enc_suspect"]
    assert out[5]["repl_chars"] == 2 and out[5]["enc_suspect"]


def test_mojibake_clean_ascii_and_real_unicode_pass(spark):
    from png_from_pdf_extracter_spark.functions.text import encoding_health

    # PROPERLY encoded non-ASCII must not be flagged: é’s codepoints are
    # not cp1252-lead+continuation pairs
    df = spark.createDataFrame(
        [(1, "café résumé — it’s fine…"), (2, "plain ascii")],
        "doc_id long, text string",
    )
    rows = df.select("doc_id", *encoding_health("text")).collect()
    assert all(not r["enc_suspect"] for r in rows)


def test_curriculum_stage_balance_and_tie_stability(spark):
    from pyspark.sql import functions as F

    from png_from_pdf_extracter_spark.functions.curate import (
        curriculum_stages,
    )

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    out = curriculum_stages(df, "doc_id", "s", n_stages=4, quantize=0)
    per = {
        r["stage"]: r["n"]
        for r in out.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    assert per == {0: 25, 1: 25, 2: 25, 3: 25}
    # monotone: every stage-0 score below every stage-3 score
    rowsd = {r["id"]: r for r in out.collect()}
    assert rowsd[0]["stage"] == 0 and rowsd[99]["stage"] == 3
    # ties share a stage even when they straddle the quantile line
    tied = spark.createDataFrame(
        [(i, 1.0) for i in range(10)] + [(100, 9.0), (101, 9.0)],
        "doc_id long, s double",
    )
    t = curriculum_stages(tied, "doc_id", "s", n_stages=2, quantize=0)
    stages = {r["id"]: r["stage"] for r in t.collect()}
    assert len({stages[i] for i in range(10)}) == 1  # all tied -> one stage
    # sort_key is the md5 of the id, deterministic
    import hashlib

    assert rowsd[7]["sort_key"] == hashlib.md5(b"7").hexdigest()


def test_dp_counts_noise_shape_and_clamp(spark):
    from png_from_pdf_extracter_spark.functions.curate import (
        dp_group_counts,
    )

    rows = [(f"g{i % 20}",) for i in range(400)]
    df = spark.createDataFrame(rows, "g string")
    out = dp_group_counts(df, ("g",), eps_num=1, eps_den=1).collect()
    assert len(out) == 20
    errs = [r["released_q6"] - r["n_true"] for r in out]
    # Laplace(1): most draws within a few units, deterministic per key
    assert all(abs(e) < 15 for e in errs)
    assert any(e > 0 for e in errs) and any(e < 0 for e in errs)
    # determinism: rerun produces identical releases
    out2 = dp_group_counts(df, ("g",), eps_num=1, eps_den=1).collect()
    assert {(r["g"], r["released_q6"]) for r in out} == {
        (r["g"], r["released_q6"]) for r in out2
    }
    # different seed -> different noise
    out3 = dp_group_counts(
        df, ("g",), eps_num=1, eps_den=1, seed="other"
    ).collect()
    assert {(r["g"], r["released_q6"]) for r in out} != {
        (r["g"], r["released_q6"]) for r in out3
    }
    # tight epsilon -> bigger noise scale (eps = 1/10 -> b = 10)
    wide = dp_group_counts(df, ("g",), eps_num=1, eps_den=10).collect()
    werrs = [abs(r["released_q6"] - r["n_true"]) for r in wide]
    assert max(werrs) > max(abs(e) for e in errs)
    # clamp: a tiny group with large negative noise never goes below 0
    assert all(r["released_q6"] >= 0.0 for r in wide)


def test_neyman_allocation_hand_case(spark):
    from png_from_pdf_extracter_spark.functions.curate import (
        neyman_allocation,
    )
    import math

    # stratum a: 100 rows sd~0; b: 100 rows sd 10-ish; c: 400 rows same sd
    rows = (
        [("a", 5.0)] * 100
        + [("b", float(v)) for v in range(100)]
        + [("c", float(v % 100)) for v in range(400)]
    )
    df = spark.createDataFrame(rows, "st string, v double")
    out = {
        r["st"]: r
        for r in neyman_allocation(
            df, ("st",), "v", total_n=1000, quantize=0
        ).collect()
    }
    # constant stratum: weight 0
    assert out["a"]["alloc_frac_q6"] == 0.0 and out["a"]["n_alloc"] == 0
    # same sd, 4x the rows -> ~4x the allocation
    ratio = out["c"]["n_alloc"] / out["b"]["n_alloc"]
    assert 3.8 < ratio < 4.2
    # fractions sum to ~1 and allocations to <= total
    assert (
        abs(sum(r["alloc_frac_q6"] for r in out.values()) - 1.0) < 1e-4
    )
    assert sum(r["n_alloc"] for r in out.values()) <= 1000
    # sd matches numpy sample sd for stratum b
    vals = list(range(100))
    mean = sum(vals) / 100
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / 99)
    assert abs(out["b"]["sd_q6"] - sd) < 1e-4


def test_stratified_estimate_recovers_population_mean(spark):
    from png_from_pdf_extracter_spark.functions.curate import (
        hash_sample,
        stratified_estimate,
    )
    from pyspark.sql import functions as F

    # two strata with very different means; 50% deterministic sample
    rows = [(i, "a", 100.0 + (i % 7)) for i in range(200)]
    rows += [(1000 + i, "b", 500.0 + (i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, st string, v double")
    samp = df.filter(hash_sample(df, "id", 1, 2))
    pop = df.groupBy("st").agg(F.count("*").cast("long").alias("n_pop"))
    r = stratified_estimate(samp, pop, ("st",), "v", quantize=0).collect()[
        0
    ]
    true_mean = (
        sum(100.0 + (i % 7) for i in range(200))
        + sum(500.0 + (i % 5) for i in range(100))
    ) / 300.0
    assert r["n_pop"] == 300 and r["k_strata"] == 2
    # stratified estimate lands near truth with a small SE
    assert abs(r["est_q6"] - true_mean) < 3 * max(r["se_q6"], 1.0)
    assert 0 < r["se_q6"] < 5.0
    assert r["n_thin"] == 0

    assert r["n_unsampled"] == 0 and r["n_pop_missing"] == 0

    # full census: fpc makes SE exactly 0 and the estimate exact
    r2 = stratified_estimate(df, pop, ("st",), "v", quantize=0).collect()[
        0
    ]
    assert abs(r2["est_q6"] - true_mean) < 1e-4
    assert r2["se_q6"] == 0.0


def test_stratified_estimate_reports_unsampled_strata(spark):
    """A stratum the audit draw never reached must surface as a
    coverage gap (n_unsampled / n_pop_missing), not silently vanish
    into a renormalized estimate."""
    from png_from_pdf_extracter_spark.functions.curate import (
        stratified_estimate,
    )
    from pyspark.sql import functions as F

    rows = [(i, "a", 10.0) for i in range(40)]
    rows += [(100 + i, "b", 99.0) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, st string, v double")
    pop = df.groupBy("st").agg(F.count("*").cast("long").alias("n_pop"))
    # the sample only ever saw stratum "a"
    samp = df.filter(F.col("st") == "a").limit(10)
    r = stratified_estimate(samp, pop, ("st",), "v", quantize=0).collect()[
        0
    ]
    assert r["k_strata"] == 1
    assert r["n_unsampled"] == 1
    assert r["n_pop_missing"] == 60
    # the estimate renormalizes over the SAMPLED strata only
    assert r["n_pop"] == 40
    assert abs(r["est_q6"] - 10.0) < 1e-6


def test_mixture_divergence_on_target_and_skewed(spark):
    from png_from_pdf_extracter_spark.functions.curate import (
        mixture_divergence,
    )
    import math

    # exactly the 1:1 target -> all divergences 0
    rows = [("a",)] * 50 + [("b",)] * 50
    df = spark.createDataFrame(rows, "g string")
    r = mixture_divergence(df, "g", {"a": 1, "b": 1}).collect()[0]
    assert r["kl_q6"] == 0.0 and r["tv_q6"] == 0.0
    assert r["chi2n_q6"] == 0.0 and r["n_unmatched"] == 0

    # 80/20 against 50/50: hand-computed divergences
    rows2 = [("a",)] * 80 + [("b",)] * 20
    df2 = spark.createDataFrame(rows2, "g string")
    r2 = mixture_divergence(df2, "g", {"a": 1, "b": 1}).collect()[0]
    kl = 0.8 * math.log(0.8 / 0.5) + 0.2 * math.log(0.2 / 0.5)
    assert abs(r2["kl_q6"] - kl) < 2e-6
    assert abs(r2["tv_q6"] - 0.3) < 2e-6
    assert abs(r2["chi2n_q6"] - (0.09 / 0.5 + 0.09 / 0.5)) < 2e-6

    # rogue group counted, excluded from the sums; empty target group
    # contributes its TV mass
    rows3 = [("a",)] * 50 + [("zz",)] * 10
    df3 = spark.createDataFrame(rows3, "g string")
    r3 = mixture_divergence(df3, "g", {"a": 1, "b": 1}).collect()[0]
    assert r3["n_unmatched"] == 10 and r3["n"] == 50
    assert abs(r3["tv_q6"] - 0.5) < 2e-6  # p=(1,0) vs q=(.5,.5)


def test_pack_efficiency_fill_and_overflow(spark):
    from png_from_pdf_extracter_spark.functions.curate import (
        pack_efficiency,
    )

    # docs of 600 tokens, target 1000: seqs get 2 docs (1200 tokens,
    # overflow) except possibly the tail
    rows = [("k", i, 600) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, doc_id int, n_tok int")
    r = pack_efficiency(df, "source", "doc_id", "n_tok", 1000).collect()[
        0
    ]
    assert r["n_docs"] == 10 and r["total_tokens"] == 6000
    # offset chunking: 600-token docs at offsets 0..5400 land in seqs
    # 0,0,1,1,2,3,3,4,4,5 -> 6 seqs, four 1200-token overflows and two
    # 600-token tails
    assert r["n_seqs"] == 6 and r["n_over"] == 4 and r["n_under"] == 2
    assert abs(r["fill_q6"] - 1.0) < 2e-6

    # perfect packing: 1000-token docs, target 1000
    rows2 = [("k", i, 1000) for i in range(4)]
    df2 = spark.createDataFrame(
        rows2, "source string, doc_id int, n_tok int"
    )
    r2 = pack_efficiency(df2, "source", "doc_id", "n_tok", 1000).collect()[
        0
    ]
    assert r2["n_seqs"] == 4 and r2["n_over"] == 0 and r2["n_under"] == 0
    assert r2["fill_q6"] == 1.0


def test_diversity_card_hand_case(spark):
    import math

    from png_from_pdf_extracter_spark.functions.curate import (
        diversity_card,
    )

    rows = (
        [("g1", "a")] * 4
        + [("g1", "b")] * 3
        + [("g1", "c")] * 2
        + [("g1", "d")] * 1
        + [("g2", "x")] * 7
    )
    df = spark.createDataFrame(rows, "grp string, item string")
    out = {r["grp"]: r for r in diversity_card(df, "grp", "item").collect()}
    g1 = out["g1"]
    assert g1["n_rows"] == 10 and g1["k_items"] == 4
    h = sum((c / 10) * math.log(10 / c) for c in (4, 3, 2, 1))
    assert abs(g1["shannon_q6"] - math.floor(h * 1e6) / 1e6) < 2e-6
    assert abs(g1["evenness_q6"] - math.floor(h / math.log(4) * 1e6) / 1e6) < 2e-6
    simpson = (4 * 3 + 3 * 2 + 2 * 1 + 0) / (10 * 9)
    assert abs(g1["simpson_q6"] - math.floor(simpson * 1e6) / 1e6) < 2e-6
    assert abs(g1["berger_parker_q6"] - 0.4) < 2e-6
    # monoculture group: H = 0, Simpson = 1, evenness undefined (k=1)
    g2 = out["g2"]
    assert g2["shannon_q6"] == 0.0
    assert g2["simpson_q6"] == 1.0
    assert g2["gini_simpson_q6"] == 0.0
    assert g2["evenness_q6"] is None
    assert g2["berger_parker_q6"] == 1.0
