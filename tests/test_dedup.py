"""Dedup family unit tests: the n-gram DF-ceiling blow-up guard, cache
hygiene (persist/release), SimHash pigeonhole validation, and the explicit
``dim`` parameter on the embedding similarity functions.

The value-level correctness of every dedup op is pinned by the DuckDB
oracle parity suite; these tests pin the SCALE-safety contracts the oracle
cannot see (candidate-count bounds, cached-RDD lifecycle, fail-loud
parameter validation).
"""

import pytest

from png_from_pdf_extracter_spark.functions import dedup, similarity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hot_shingle_docs(spark, n_docs=40):
    """Half the docs share one boilerplate sentence (the hot shingle);
    every doc is otherwise unique."""
    hot = "all rights reserved by the site"
    rows = []
    for i in range(n_docs):
        body = f"unique words {i} alpha{i} beta{i} gamma{i} delta{i}"
        rows.append((i, f"{body} {hot}" if i % 2 == 0 else body))
    return _docs(spark, rows)


def test_hot_shingle_guard_bounds_candidates(spark):
    """One shingle in 50% of docs makes the self-join quadratic: C(20,2) =
    190 candidate pairs from boilerplate alone. The DF ceiling drops those
    shingles before the join, so zero cross-doc candidates remain."""
    df = _hot_shingle_docs(spark)
    unguarded = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.05, max_shingle_df=0
    )
    guarded = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.05, max_shingle_df=5
    )
    try:
        assert unguarded.count() >= 190
        assert guarded.count() == 0
    finally:
        dedup.release(unguarded)
        dedup.release(guarded)


def test_guard_on_by_default(spark):
    """The default ``max_shingle_df`` must be active (non-zero) — round-1
    shipped it off while the docstring claimed on."""
    import inspect

    sig = inspect.signature(dedup.ngram_jaccard_pairs)
    assert sig.parameters["max_shingle_df"].default > 0


def test_release_unpersists_cached_intermediates(spark):
    """Each pair-generating dedup op persists an intermediate (shingles /
    bands / signatures); ``release`` must return the session to its prior
    cached-RDD set after the consuming action."""
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    df = _docs(spark, [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d") for i in range(20)])
    makers = [
        lambda: dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.9),
        lambda: dedup.minhash_lsh_pairs(
            df, "doc_id", "text", n=2, num_hashes=4, rows_per_band=2
        ),
        lambda: dedup.simhash_near_dup_pairs(
            df, "doc_id", "text", bits=32, max_hamming=1, n_bands=2
        ),
        lambda: dedup.jaccard_prefix_join(
            df, "doc_id", "text", n=2, threshold=0.9
        ),
    ]
    for make in makers:
        out = make()
        out.count()
        dedup.release(out)
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before, f"leaked cached RDDs: {after - before}"


def test_release_noop_on_plain_dataframe(spark):
    dedup.release(_docs(spark, [(1, "a")]))  # must not raise


def test_simhash_band_validation(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.simhash_near_dup_pairs(
            df, "doc_id", "text", bits=32, max_hamming=4, n_bands=4
        )
    with pytest.raises(ValueError, match="divisible"):
        dedup.simhash_near_dup_pairs(
            df, "doc_id", "text", bits=32, max_hamming=2, n_bands=5
        )


def test_similarity_explicit_dim_matches_probe(spark):
    """Passing ``dim`` must produce identical results to the probed path
    (it exists purely to skip the probe job)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter("vec_id < 3")
    probed = similarity.lsh_bucket_topk(e, q, k=3)
    explicit = similarity.lsh_bucket_topk(e, q, k=3, dim=64)
    assert sorted(map(tuple, probed.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_probe_dim_raises_on_empty(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="probe"):
        similarity._probe_dim(empty, "embedding")


def test_contamination_check_excludes_self_and_finds_overlap(spark):
    """A corpus doc sharing an n-gram with a benchmark doc is flagged;
    the benchmark doc itself (same id) is not flagged by its own shingles
    alone."""
    corpus = _docs(spark, [
        (0, "the quick brown fox jumps"),      # benchmark member
        (1, "lazy dog sleeps all day"),        # clean
        (2, "a quick brown fox appears here"), # contaminated via bigrams
    ])
    bench = corpus.filter("doc_id = 0")
    from png_from_pdf_extracter_spark.functions.dedup import contamination_check
    out = {r["doc_id"]: (r["n_shared_shingles"], r["n_benchmark_docs"])
           for r in contamination_check(corpus, bench, "doc_id", "text", n=2).collect()}
    assert 2 in out and out[2][1] == 1
    assert out[2][0] == 2  # "quick brown", "brown fox"
    assert 0 not in out    # self-pair excluded
    assert 1 not in out    # clean doc absent


def test_minhash_band_validation(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="divisible"):
        dedup.minhash_lsh_pairs(df, "doc_id", "text", num_hashes=8, rows_per_band=3)


def test_connected_components_vs_union_find(spark):
    """Random pair graphs: label propagation must match a pure-Python
    union-find (component = min member id), across shapes that exercise
    chains (slow diameter), stars, and singleton pairs."""
    import random

    rng = random.Random(123)
    cases = []
    # random graph
    cases.append([(rng.randrange(60), rng.randrange(60)) for _ in range(80)])
    # long chain (worst-case diameter) + a star + isolated pair
    cases.append([(i, i + 1) for i in range(30)] + [(100, x) for x in range(101, 110)] + [(500, 501)])
    for pairs in cases:
        pairs = [(a, b) for a, b in pairs if a != b]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        want = {}
        nodes = {n for p in pairs for n in p}
        comp_min = {}
        for n in nodes:
            comp_min.setdefault(find(n), []).append(n)
        for root, members in comp_min.items():
            m = min(members)
            for n in members:
                want[n] = m

        df = spark.createDataFrame(pairs, "id1 long, id2 long")
        out = dedup.connected_components(df, max_iter=50)
        got = {r["node"]: r["component"] for r in out.collect()}
        dedup.release(out)
        assert got == want


class TestDuplicatedChunks:
    def test_finds_cross_doc_passage(self, spark):
        shared = "X" * 35 + "YABCD"  # one full 40-char window
        rows = [
            (1, shared + " unique tail one " + "a" * 40),
            (2, "different head " + "b" * 30 + shared),
            (3, "no overlap here " + "c" * 60),
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        # stride 1 => every window; the shared passage must surface
        out = dedup.duplicated_chunks(
            d, "doc_id", "text", chunk=40, stride=1
        ).collect()
        assert any(r["chunk"] == shared and r["n_docs"] == 2 for r in out)
        assert all(r["n_docs"] >= 2 for r in out)
        assert all(3 not in (r["first_doc"],) for r in out)

    def test_short_docs_skipped_and_no_partial_chunks(self, spark):
        rows = [(1, "short"), (2, "short")]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        assert (
            dedup.duplicated_chunks(d, "doc_id", "text", chunk=40).count()
            == 0
        )

    def test_within_doc_repeat_not_cross_doc(self, spark):
        # same window twice in ONE doc: n_docs stays 1 -> filtered out
        rep = "z" * 40
        d = spark.createDataFrame(
            [(1, rep + rep)], "doc_id long, text string"
        )
        assert (
            dedup.duplicated_chunks(
                d, "doc_id", "text", chunk=40, stride=40
            ).count()
            == 0
        )


def test_apply_dedup_survivors(spark):
    # clusters {1,2,3} (chain) and {7,9}; 5 and 8 untouched.
    # survivors = min of each cluster + unpaired docs = {1, 5, 7, 8}
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 5, 7, 8, 9)],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 7)], ["id1", "id2"]
    )
    out = dedup.apply_dedup(docs, pairs)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 5, 7, 8]
    assert out.columns == docs.columns  # pass-through, nothing added
    dedup.release(out)


def test_apply_dedup_no_pairs_is_identity(spark):
    docs = spark.createDataFrame(
        [(i, "t") for i in range(5)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([], "id1 long, id2 long")
    out = dedup.apply_dedup(docs, pairs)
    assert out.count() == 5
    dedup.release(out)


def test_components_driver_and_distributed_paths_agree(spark):
    # same graph through the union-find fast path (default) and the
    # distributed min-propagation loop (driver_max_edges=0)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 7), (7, 4), (10, 11), (11, 10)],
        ["id1", "id2"],
    )
    fast = sorted(
        (r["node"], r["component"])
        for r in dedup.connected_components(pairs).collect()
    )
    dist_df = dedup.connected_components(pairs, driver_max_edges=0)
    dist = sorted((r["node"], r["component"]) for r in dist_df.collect())
    dedup.release(dist_df)
    assert fast == dist
    assert fast == [
        (1, 1), (2, 1), (3, 1), (4, 4), (7, 4), (9, 4), (10, 10), (11, 10)
    ]


def test_minhash_incremental_dedup_drops_reingests_keeps_novel(spark):
    base = [
        (i, f"alpha bravo charlie delta echo foxtrot golf hotel india w{i}")
        for i in range(20)
    ]
    old = spark.createDataFrame(base, ["doc_id", "text"])
    novel = [
        (100 + i, f"zulu yankee xray whiskey victor uniform tango s{i} q{i} p{i}")
        for i in range(5)
    ]
    # re-ingest of old docs with mangled whitespace: shingle-identical
    reingest = [(1000 + i, t.replace(" ", "  ")) for i, t in base[:6]]
    new = spark.createDataFrame(novel + reingest, ["doc_id", "text"])
    kept = dedup.minhash_incremental_dedup(old, new, "doc_id", "text")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert all(i < 1000 for i in ids)  # every re-ingest dropped
    assert set(range(100, 105)) <= set(ids)  # every novel doc kept
    assert kept.columns == new.columns


def test_minhash_incremental_dedup_validates_bands(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dedup.minhash_incremental_dedup(
            df, df, "doc_id", "text", num_hashes=8, rows_per_band=3
        )


def test_rolling_fingerprint_hand_computed_and_incremental(spark):
    """fp('abc') = ((0*31+97)*31+98)*31+99 = 96354; normalization makes
    whitespace-mangled text collide; the polynomial form supports the
    O(1) sliding-window update the docstring claims (verified by
    recomputing a shifted window from the closed form)."""
    from png_from_pdf_extracter_spark.functions import text as T

    d = spark.createDataFrame(
        [(1, "abc"), (2, "a   b"), (3, "a b"), (4, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["fp"]
           for r in d.select("doc_id",
                             T.rolling_fingerprint("text").alias("fp")
                             ).collect()}
    assert out[1] == 96354
    assert out[2] == out[3]  # whitespace-normalized collision
    assert out[4] == 0

    # O(1) slide: fp of window s[1:]+c == (fp - ord(s[0])*31^(w-1))*31+c
    p, w = 1_000_000_007, 3
    def fp(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % p
        return acc
    s, nxt = "xyz", "w"
    slid = ((fp(s) - ord(s[0]) * pow(31, w - 1, p)) * 31 + ord(nxt)) % p
    assert slid == fp(s[1:] + nxt)


def test_components_string_ids_diameter_gt2_both_paths(spark):
    """String doc ids through BOTH components paths. The distributed
    loop's decimal label-sum convergence is undefined for strings (cast
    -> NULL); the fallback changed-count check must keep propagating a
    diameter-4 chain to its far end instead of exiting after round one
    (the None == None bug)."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        ["id1", "id2"],
    )
    fast = sorted(
        (r["node"], r["component"])
        for r in dedup.connected_components(pairs).collect()
    )
    dist_df = dedup.connected_components(pairs, driver_max_edges=0)
    dist = sorted((r["node"], r["component"]) for r in dist_df.collect())
    dedup.release(dist_df)
    expected = [
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"), ("e", "a"),
        ("x", "x"), ("y", "x"),
    ]
    assert fast == expected
    assert dist == expected


def test_duplicate_spans_hand_computed(spark):
    """ExactSubstr spans (Lee et al. 2021 form): cross-doc copied run is
    cut from the later doc only (keep-first), internal repetition is cut
    after its first period, overlapping windows merge into maximal
    spans. 1-based inclusive token indices."""
    rows = [
        (0, "a b c d e f g h i j"),
        (1, "x1 x2 a b c d e f g h i j y"),
        (2, "p q r s p q r s p q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.duplicate_spans(df, window=4).collect()
    }
    # doc 1: the copied 10-token run sits at tokens 3..12; doc 0 (smaller
    # (doc, pos)) keeps every window, so only doc 1 reports the span.
    # doc 2: period-4 repetition — windows at pos 5..9 duplicate pos 1..4,
    # merging to tokens 5..12.
    assert got == {(1, 3, 12, 10), (2, 5, 12, 8)}


def test_duplicate_spans_short_docs_and_no_dups(spark):
    rows = [(0, "only three tokens"), (1, "all unique words here today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.duplicate_spans(df, window=4).count() == 0


def test_remove_duplicate_spans_hand_computed(spark):
    """Apply side: cut the spans test_duplicate_spans_hand_computed pins
    and rebuild text from surviving tokens; span-free docs pass through
    unchanged (lowercase token contract)."""
    rows = [
        (0, "a b c d e f g h i j"),
        (1, "x1 x2 a b c d e f g h i j y"),
        (2, "p q r s p q r s p q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = dedup.duplicate_spans(df, window=4)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in dedup.remove_duplicate_spans(df, spans).collect()
    }
    assert got == {
        0: (10, 0, "a b c d e f g h i j"),
        1: (13, 10, "x1 x2 y"),
        2: (12, 8, "p q r s"),
    }


# ---------------------------------------------------------- decontaminate

def test_decontaminate_drops_planted_copy_keeps_rest(spark):
    bench = spark.createDataFrame(
        [(1000, "the secret benchmark answer key alpha beta gamma")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the secret benchmark answer key alpha beta gamma delta"),
            (2, "a completely unrelated document about parquet files"),
            (3, "another unrelated text with zero overlap tokens"),
        ],
        "doc_id long, text string",
    )
    kept = dedup.decontaminate(corpus, bench, "doc_id", "text", n=2)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]


def test_decontaminate_min_shared_threshold(spark):
    bench = spark.createDataFrame(
        [(9, "aa bb cc dd ee")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "aa bb zz yy xx"),        # 1 shared bigram (aa bb)
            (2, "aa bb cc dd qq"),        # 3 shared bigrams
        ],
        "doc_id long, text string",
    )
    kept2 = dedup.decontaminate(
        corpus, bench, "doc_id", "text", n=2, min_shared=2
    )
    assert sorted(r["doc_id"] for r in kept2.collect()) == [1]
    kept1 = dedup.decontaminate(
        corpus, bench, "doc_id", "text", n=2, min_shared=1
    )
    assert kept1.count() == 0


# ------------------------------------------------------ jaccard prefix join

def _brute_jaccard_pairs(docs, n, t):
    """Independent python reimplementation: exact word-n-gram Jaccard."""
    sets = {}
    for i, txt in docs:
        w = txt.split()
        sets[i] = {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}
    out = {}
    ids = sorted(sets)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            if not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            # same integer gate as the operator: inter/union >= t exactly
            if inter * (10000 + int(round(t * 10000))) >= int(
                round(t * 10000)
            ) * (len(sets[i]) + len(sets[j])):
                out[(i, j)] = round(inter / union, 4)
    return out


def test_jaccard_prefix_join_equals_bruteforce_random(spark):
    """Randomized (fixed-seed) equality vs an independent brute force —
    the prefix filter must lose NO qualifying pair."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30))))
        for i in range(40)
    ]
    # plant near-duplicates so the >=0.7 band is populated
    docs += [(100, docs[0][1]), (101, docs[1][1] + " extraword")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.jaccard_prefix_join(
            df, "doc_id", "text", n=3, threshold=0.7
        ).collect()
    }
    assert got == _brute_jaccard_pairs(docs, 3, 0.7)
    assert got[(0, 100)] == 1.0  # the planted exact copy


def test_jaccard_prefix_join_boilerplate_shingle_no_pairs(spark):
    """Every doc shares one boilerplate shingle but nothing else — no
    pair reaches the threshold, and no DF ceiling was needed to say so."""
    docs = [
        (i, f"common header line unique{i} token{i} body{i} tail{i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.jaccard_prefix_join(df, "doc_id", "text", n=3, threshold=0.5)
    assert out.count() == 0


# ---- tfidf_cosine_pairs ----

from png_from_pdf_extracter_spark.functions.dedup import (  # noqa: E402
    tfidf_cosine_pairs,
)


def test_tfidf_cosine_identical_docs_sim_one(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id1"], r["id2"]): r["sim_ppm"]
        for r in tfidf_cosine_pairs(df, min_sim_ppm=0).collect()
    }
    assert out[(1, 2)] == 1_000_000
    assert (1, 3) not in out and (2, 3) not in out  # disjoint vocab


def test_tfidf_cosine_partial_overlap_bruteforce(spark):
    import math

    docs = {
        1: "a b c",
        2: "a b d",
        3: "x y z a",
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    out = {
        (r["id1"], r["id2"]): r["sim_ppm"]
        for r in tfidf_cosine_pairs(df, min_sim_ppm=0).collect()
    }
    # python reference with the same quantized weights
    from collections import Counter

    N = len(docs)
    tf = {d: Counter(t.split()) for d, t in docs.items()}
    dfreq = Counter(w for c in tf.values() for w in c)
    wq = {
        d: {
            w: math.floor(t * math.log((N + 1) / (dfreq[w] + 1)) * 1e6)
            for w, t in c.items()
        }
        for d, c in tf.items()
    }
    for (i, j), got in out.items():
        dot = sum(wq[i][w] * wq[j].get(w, 0) for w in wq[i])
        n1 = sum(v * v for v in wq[i].values())
        n2 = sum(v * v for v in wq[j].values())
        expect = math.floor(dot / math.sqrt(n1 * n2) * 1e6)
        assert got == expect, (i, j)
    assert (1, 2) in out


def test_tfidf_cosine_max_df_guard_drops_hot_terms(spark):
    # 'the' in every doc would pair everything; with max_df=2 it is
    # dropped and only the real overlap pairs survive
    df = spark.createDataFrame(
        [
            (1, "the quick fox"),
            (2, "the lazy dog"),
            (3, "the quick dog"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_cosine_pairs(df, min_sim_ppm=0, max_df=2).collect()
    pairs = {(r["id1"], r["id2"]) for r in out}
    assert pairs == {(1, 3), (2, 3)}  # via quick / dog; never via 'the'
    import pytest

    with pytest.raises(ValueError):
        tfidf_cosine_pairs(df, max_df=1)


def test_tfidf_cosine_top_k_caps_per_doc_and_keeps_best(spark):
    # doc 1 pairs with 2, 3 and 4; top_k=1 keeps only its single most
    # similar partner, and every kept row is identical (same sim_ppm)
    # to the ungated run's row for that pair — the cap is a rank
    # filter, never a re-score
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # sim 1.0 with doc 1
            (3, "alpha beta gamma zeta"),
            (4, "alpha beta theta iota"),
        ],
        "doc_id long, text string",
    )
    full = {
        (r["id1"], r["id2"]): r["sim_ppm"]
        for r in tfidf_cosine_pairs(df, min_sim_ppm=0, max_df=10).collect()
    }
    capped = tfidf_cosine_pairs(
        df, min_sim_ppm=0, max_df=10, top_k=1
    ).collect()
    per_id1 = {}
    for r in capped:
        per_id1.setdefault(r["id1"], []).append(r)
    assert all(len(v) == 1 for v in per_id1.values())
    # doc 1's best partner is its exact copy, doc 2
    assert per_id1[1][0]["id2"] == 2
    for r in capped:
        assert full[(r["id1"], r["id2"])] == r["sim_ppm"]
        # and it really is id1's max similarity
        best = max(v for (a, _), v in full.items() if a == r["id1"])
        assert r["sim_ppm"] == best


# ---- apply_dedup_best ----

from png_from_pdf_extracter_spark.functions.dedup import (  # noqa: E402
    apply_dedup_best,
)


def test_apply_dedup_best_keeps_highest_score(spark):
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        "doc_id long, q double",
    )
    # cluster {1,2,3} and {4}; 9 untouched singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id1 long, id2 long"
    )
    kept = {
        r["doc_id"] for r in apply_dedup_best(docs, pairs, "q").collect()
    }
    # winner of {1,2,3}: score tie 2 vs 3 -> smaller id 2; singletons stay
    assert kept == {2, 4, 9}


def test_apply_dedup_best_vs_min_id_convention(spark):
    from png_from_pdf_extracter_spark.functions.dedup import apply_dedup

    docs = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "doc_id long, q double"
    )
    pairs = spark.createDataFrame([(0, 5), (1, 5)], "id1 long, id2 long")
    best = {r["doc_id"] for r in apply_dedup_best(docs, pairs, "q").collect()}
    minid = {r["doc_id"] for r in apply_dedup(docs, pairs).collect()}
    assert best == {2, 3, 4, 5}   # highest score in {0,1,5} is 5
    assert minid == {0, 2, 3, 4}  # min id keeps 0


def test_apply_dedup_best_string_ids(spark):
    docs = spark.createDataFrame(
        [("a", 1.0), ("b", 3.0), ("c", 3.0)], "doc_id string, q double"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id1 string, id2 string"
    )
    kept = {
        r["doc_id"] for r in apply_dedup_best(docs, pairs, "q").collect()
    }
    assert kept == {"b"}  # tie b/c at 3.0 -> min id b


def test_token_wer_hand_computed(spark):
    from png_from_pdf_extracter_spark.functions.dedup import (
        token_edit_distance_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, ["the", "cat", "sat", "on", "the", "mat"]),
            (2, ["the", "cat", "stood", "on", "the", "mat"]),
            (3, ["a", "dog", "ran"]),
            (4, []),
        ],
        "doc_id long, toks array<string>",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 3), (1, 4)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in token_edit_distance_pairs(docs, pairs, "doc_id", "toks")
        .collect()
    }
    # one substitution (sat -> stood) at token level
    r = out[(1, 2)]
    assert r["dist"] == 1 and r["wer_q6"] == 0.166666  # floor-6dp of 1/6
    # completely different: 3 subs + 3 deletions = 6 edits
    assert out[(1, 3)]["dist"] == 6 and out[(1, 3)]["wer_q6"] == 1.0
    # empty reference: dist = len(hyp), wer null
    assert out[(4, 3)]["dist"] == 3 and out[(4, 3)]["wer_q6"] is None
    # empty hypothesis: dist = len(ref)
    assert out[(1, 4)]["dist"] == 6 and out[(1, 4)]["wer_q6"] == 1.0


def test_token_wer_word_level_not_char_level(spark):
    from png_from_pdf_extracter_spark.functions.dedup import (
        token_edit_distance_pairs,
    )

    # char-level levenshtein('abcdef','abcdxf') would be 1 regardless;
    # the point of the encoding is that a whole-word swap costs exactly
    # 1 even when the words share most characters
    docs = spark.createDataFrame(
        [(1, ["internationalization"]), (2, ["internationalisation"])],
        "doc_id long, toks array<string>",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = token_edit_distance_pairs(docs, pairs, "doc_id", "toks").collect()[0]
    assert r["dist"] == 1 and r["wer_q6"] == 1.0
