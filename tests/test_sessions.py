"""Sessionization unit semantics + IVF ANN sanity."""

import datetime as dt

from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.operators import session_stats, sessionize


def _ts(minute):
    return dt.datetime(2026, 1, 1, 0, minute, 0, tzinfo=dt.timezone.utc)


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user a: events at 0, 10, 50, 55 min with 30-min gap -> sessions 1,1,2,2
        ("a", 1, _ts(0)),
        ("a", 2, _ts(10)),
        ("a", 3, _ts(50)),
        ("a", 4, _ts(55)),
        # user b: single event
        ("b", 5, _ts(7)),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id int, ts timestamp")
    out = sessionize(df, "user_id", "ts", 1800, tiebreak_col="event_id")
    got = {
        (r["user_id"], r["event_id"]): (r["session_idx"], r["is_session_start"])
        for r in out.collect()
    }
    assert got == {
        ("a", 1): (1, 1),
        ("a", 2): (1, 0),
        ("a", 3): (2, 1),
        ("a", 4): (2, 0),
        ("b", 5): (1, 1),
    }

    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
        for r in session_stats(out, "user_id", "ts").collect()
    }
    assert stats == {
        ("a", 1): (2, 600),
        ("a", 2): (2, 300),
        ("b", 1): (1, 0),
    }


def test_sessionize_exact_gap_not_boundary(spark):
    # diff == gap stays in-session (strict > starts a new one)
    rows = [("u", 1, _ts(0)), ("u", 2, _ts(30))]
    df = spark.createDataFrame(rows, "user_id string, event_id int, ts timestamp")
    out = sessionize(df, "user_id", "ts", 1800, tiebreak_col="event_id")
    assert {r["session_idx"] for r in out.collect()} == {1}


def test_ivf_topk_matches_exact_for_probed_cells(spark):
    """IVF with nprobe == n_cells degenerates to exact brute force — the
    rerank math must then agree with cosine_topk rank-for-rank."""
    from png_from_pdf_extracter_spark.functions import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.cosine_topk(e, q, k=3).collect()
    }
    ivf_all = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ivf_topk(e, q, k=3, n_cells=4, nprobe=4).collect()
    }
    assert ivf_all == exact

    # real IVF setting: nprobe < n_cells returns <= k ranked rows per query,
    # each a genuine corpus neighbor with correctly ordered ranks
    approx = similarity.ivf_topk(e, q, k=3, n_cells=8, nprobe=2)
    rows = approx.collect()
    assert len(rows) > 0
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for ranks in per_q.values():
        ranks.sort()
        sims = [s for _, s in ranks]
        assert sims == sorted(sims, reverse=True)
        assert [i for i, _ in ranks] == list(range(1, len(ranks) + 1))


def test_auto_n_cells_distribution_bounded_across_10x_scale(spark):
    """Round-2 verdict #5: with ``n_cells=None`` the cell count derives
    from the corpus (ceil(n / target_cell_rows)), so the cell-SIZE
    distribution stays bounded when the corpus grows 10x — the plan shape
    no longer depends on a caller-tuned constant."""
    import numpy as np

    from png_from_pdf_extracter_spark.functions import similarity

    rng = np.random.default_rng(7)
    target = 64

    def corpus(n):
        vecs = rng.standard_normal((n, 8)).astype(float)
        return spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )

    sizes = {}
    for n in (500, 5000):
        df = corpus(n)
        n_cells = similarity._resolve_n_cells(df, None, target)
        assert n_cells == max(16, -(-n // target))
        cents = similarity.ivf_kmeans_centroids(
            df, n_cells=n_cells, iterations=2
        )
        counts = [
            r["c"]
            for r in df.select(
                F.array_min(
                    similarity._cell_candidates(F.col("embedding"), cents)
                )["cell"].alias("cell")
            )
            .groupBy("cell")
            .agg(F.count("*").alias("c"))
            .collect()
        ]
        sizes[n] = (sum(counts) / len(counts), max(counts))
    # mean cell size tracks the target at BOTH scales (within 2x: empty
    # cells shrink the denominator) and the max stays bounded relative to
    # the target rather than growing with n
    for n, (mean_sz, max_sz) in sizes.items():
        assert mean_sz <= 2 * target, (n, mean_sz)
        assert max_sz <= 8 * target, (n, max_sz)
    # explicit 10x-invariance: max cell size grew far slower than the data
    assert sizes[5000][1] < 10 * sizes[500][1] / 2


def test_ann_queries_embed_recall(spark):
    """Round-2 verdict #6: every q_ann_* rows-only query embeds its
    query's recall@k vs the exact baseline, so the driver artifact
    captures ANN QUALITY, not just shape. Floors pinned per index type
    (all paths deterministic: md5 seeds, fixed hyperplanes)."""
    import __spark_entry__ as em

    qs = em.queries()
    floors = {
        "q_ann_lsh": 0.5,    # 8 tables x 4 planes multi-table recall
        "q_ann_ivf": 0.3,    # nprobe=2 of 16 cells
        "q_ann_pq": 0.7,     # ADC + exact rerank
        "q_ann_ivfpq": 0.5,  # cell prune x ADC x rerank
    }
    for key, floor in floors.items():
        rows = qs[key](spark, "/root/testdata/sf0.001").collect()
        assert rows, key
        per_q = {r["query_id"]: r["recall_at_k"] for r in rows}
        assert all(0.0 <= v <= 1.0 for v in per_q.values()), key
        mean = sum(per_q.values()) / len(per_q)
        assert mean >= floor, (key, mean, sorted(per_q.values()))


def test_ivf_kmeans_refinement(spark):
    """Lloyd-refined quantizer: valid ranked output, and recall >= the
    hash-seeded quantizer on the same probe budget (k-means balances cells,
    so probing the same number of cells sees at least as much true
    neighbor mass on this data)."""
    from png_from_pdf_extracter_spark.functions import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }

    def recall(df):
        hits = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(hits & exact) / len(exact)

    seeded = recall(similarity.ivf_topk(e, q, k=5, n_cells=8, nprobe=3))
    refined = similarity.ivf_topk(
        e, q, k=5, n_cells=8, nprobe=3, kmeans_iterations=2
    )
    rows = refined.collect()
    assert rows, "refined IVF returned nothing"
    for r in rows:
        assert 1 <= r["rank"] <= 5
    # refinement must not be catastrophically worse; typically it improves
    assert recall(refined) >= seeded - 0.2


def test_pq_topk_recall_and_structure(spark):
    """Product quantization: (a) codebook shapes and deterministic
    retraining, (b) encode emits m codes in [0, ksub), (c) rerank=0 ADC
    and rerank>0 exact-rerank paths both return k ranked rows per query,
    (d) recall@5 with the exact-rerank shortlist clears 0.6 on the
    near-random unit-vector corpus (the hardest case for PQ; the
    measured value here is ~0.8)."""
    from png_from_pdf_extracter_spark.functions import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)

    books = similarity.pq_codebooks(e, m=16, ksub=64, iterations=5)
    assert len(books) == 16
    assert all(len(b) <= 64 and len(b[0]) == 4 for b in books)
    books2 = similarity.pq_codebooks(e, m=16, ksub=64, iterations=5)
    assert books == books2, "codebook training must be deterministic"

    codes = similarity.pq_encode(e, books).collect()
    assert all(
        len(r["codes"]) == 16 and all(0 <= c < 64 for c in r["codes"])
        for r in codes
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }

    adc = similarity.pq_topk(
        e, q, k=5, codebooks=books, rerank=0
    ).collect()
    rr = similarity.pq_topk(e, q, k=5, codebooks=books, rerank=4).collect()
    for rows in (adc, rr):
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert len(per_q) == 8
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())

    hits = {(r["query_id"], r["neighbor_id"]) for r in rr}
    recall = len(hits & exact) / len(exact)
    assert recall >= 0.6, f"rerank recall {recall}"

    import pytest

    with pytest.raises(ValueError):
        similarity.pq_codebooks(e, m=7)  # 64 % 7 != 0


def test_ivfpq_topk_prune_and_recall(spark):
    """IVF+PQ composition: k ranked rows per query; probing EVERY cell
    removes the pruning loss, so recall must reach the pure-PQ+rerank
    level (>= 0.6 on the near-random corpus); a real nprobe<n_cells
    setting still returns well-formed ranked output."""
    from png_from_pdf_extracter_spark.functions import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }

    full = similarity.ivfpq_topk(
        e, q, k=5, n_cells=8, nprobe=8, m=16, ksub=64, iterations=5,
        rerank=4,
    ).collect()
    hits = {(r["query_id"], r["neighbor_id"]) for r in full}
    assert len(hits & exact) / len(exact) >= 0.6

    pruned = similarity.ivfpq_topk(
        e, q, k=5, n_cells=8, nprobe=3, m=16, ksub=64, iterations=3,
        rerank=4,
    ).collect()
    per_q = {}
    for r in pruned:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_semdedup_invariants_and_planted_duplicates(spark):
    """SemDeDup: (a) output is a partition of the corpus — every id
    exactly once, keep <=> id == component; (b) planted exact-duplicate
    vectors share a cell (identical vectors -> identical nearest
    centroid) and collapse into one component with the min id kept;
    (c) every flagged non-keep row really has a >=threshold cosine twin
    (verified against the exact O(n^2) pair set)."""
    from png_from_pdf_extracter_spark.functions import similarity

    e = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("vec_id") < 60)
    clones = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    corpus = e.unionByName(clones)
    n = corpus.count()

    out = similarity.semdedup(
        corpus, "vec_id", "embedding", n_cells=4, threshold=0.999
    )
    rows = out.collect()
    assert len(rows) == n
    assert len({r["id"] for r in rows}) == n
    comp = {r["id"]: r["component"] for r in rows}
    for r in rows:
        assert r["keep"] == (r["id"] == r["component"])
        assert comp[r["component"]] == r["component"]  # label is a root id

    # planted clones: same component as their source, source id kept
    for i in range(5):
        assert comp[i + 10000] == comp[i] == i
    kept = {r["id"] for r in rows if r["keep"]}
    assert all(i in kept and (i + 10000) not in kept for i in range(5))

    # every dropped row has an exact cosine >= threshold witness
    exact_pairs = similarity.embedding_near_dup_exact(
        corpus, "vec_id", "embedding", threshold=0.999
    )
    witnessed = {
        x for r in exact_pairs.collect() for x in (r["id1"], r["id2"])
    }
    dropped = {r["id"] for r in rows if not r["keep"]}
    assert dropped <= witnessed


def test_semdedup_oversized_cell_split_bounds_task_and_keeps_recall(spark):
    """The 100-TB guard: plant a hot cell (ALL vectors land in one
    k-means cell by construction: n_cells=1) with max_cell_rows small
    enough to force splitting. (a) No gram-matrix task ever sees more
    than max_cell_rows rows — the O(cell^2) term is bounded; (b) planted
    exact-duplicate PAIRS that hash into the same sub-bucket still
    collapse, and overall recall on planted clones stays >= 0.5 (the
    documented cross-sub-bucket trade); (c) output is still a partition
    of the corpus."""
    import numpy as np
    from png_from_pdf_extracter_spark.functions import similarity

    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        v = rng.normal(size=8)
        v = (v / np.linalg.norm(v)).tolist()
        rows.append((i, [float(x) for x in v]))
    # 40 planted clones of ids 0..39
    for i in range(40):
        rows.append((10_000 + i, rows[i][1]))
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = similarity.semdedup(
        corpus, "vec_id", "embedding", n_cells=1, threshold=0.999,
        max_cell_rows=60,
    ).collect()
    assert len(out) == 240
    assert len({r["id"] for r in out}) == 240
    comp = {r["id"]: r["component"] for r in out}
    hits = sum(1 for i in range(40) if comp[10_000 + i] == comp[i])
    # ceil(240/60)=4 sub-buckets -> a clone pair survives iff both ids
    # hash to the same bucket (~1/4); with 40 planted pairs the observed
    # rate concentrates well above 0 — pin a loose floor AND that the
    # split genuinely lost some (i.e. the bound was exercised)
    assert hits >= 4
    assert hits < 40

    # same corpus unsplit: every planted pair collapses (recall baseline)
    full = similarity.semdedup(
        corpus, "vec_id", "embedding", n_cells=1, threshold=0.999,
        max_cell_rows=1_000_000,
    ).collect()
    comp_full = {r["id"]: r["component"] for r in full}
    assert all(comp_full[10_000 + i] == comp_full[i] for i in range(40))


def test_semdedup_null_vectors_returned_keep_true(spark):
    from png_from_pdf_extracter_spark.functions import similarity

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, None),
            (4, None),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["id"]: r for r in similarity.semdedup(
        corpus, "vec_id", "embedding", n_cells=1, threshold=0.99
    ).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[3]["keep"] and out[4]["keep"]
    assert out[3]["cell"] is None
    assert out[1]["keep"] and not out[2]["keep"]


def test_semdedup_string_ids(spark):
    from png_from_pdf_extracter_spark.functions import similarity

    corpus = spark.createDataFrame(
        [
            ("doc-a", [1.0, 0.0]),
            ("doc-b", [1.0, 0.0]),
            ("doc-c", [0.0, 1.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    out = {r["id"]: r for r in similarity.semdedup(
        corpus, "vec_id", "embedding", n_cells=1, threshold=0.99
    ).collect()}
    assert out["doc-a"]["keep"] and not out["doc-b"]["keep"]
    assert out["doc-b"]["component"] == "doc-a"
    assert out["doc-c"]["keep"]


def test_semdedup_auto_n_cells_bounds_cell_sizes(spark):
    """n_cells=None derives the cell count from the corpus size so the
    plan shape survives growth without retuning: 10x the corpus must
    not 10x the expected cell size (cells stay near target_cell_rows)."""
    import numpy as np
    from png_from_pdf_extracter_spark.functions import similarity

    def mk(n):
        rng = np.random.default_rng(11)
        return spark.createDataFrame(
            [
                (i, [float(x) for x in rng.normal(size=4)])
                for i in range(n)
            ],
            "vec_id long, embedding array<double>",
        )

    for n in (200, 2000):
        out = similarity.semdedup(
            mk(n), "vec_id", "embedding", n_cells=None,
            target_cell_rows=100, threshold=0.999,
        )
        sizes = [
            r["c"] for r in out.groupBy("cell").agg(
                F.count("*").alias("c")
            ).collect()
        ]
        expected_cells = max(16, -(-n // 100))
        assert len(sizes) <= expected_cells
        # no cell grows unboundedly past the target as n scales 10x
        assert max(sizes) <= 20 * 100


def test_kmeans_assign_planted_cluster_separation(spark):
    """kmeans_assign (the first-class clustering exposure of the IVF
    quantizer) on three well-separated planted clusters: every planted
    cluster must land in exactly one predicted cluster (purity 1.0 on
    this separation), distinct planted clusters must not merge, the
    cosine to the owning centroid must be near 1, and the md5-seeded
    init makes the whole assignment reproducible run-to-run."""
    import numpy as np

    from png_from_pdf_extracter_spark.functions import similarity

    rng = np.random.default_rng(11)
    centers = np.eye(3) * 10.0  # orthogonal, far apart
    rows = []
    for c in range(3):
        for i in range(40):
            v = centers[c] + rng.normal(scale=0.05, size=3)
            rows.append((c * 40 + i, c, [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id long, planted int, embedding array<double>"
    )

    out = similarity.kmeans_assign(
        df, "vec_id", "embedding", n_clusters=3, iterations=3
    )
    joined = out.join(df.select("vec_id", "planted"), "vec_id").collect()
    by_planted = {}
    for r in joined:
        by_planted.setdefault(r["planted"], set()).add(r["cluster"])
        assert r["cos_to_centroid"] > 0.95, r
    # purity: each planted cluster maps to ONE predicted label…
    assert all(len(s) == 1 for s in by_planted.values()), by_planted
    # …and no two planted clusters share a label (no merge)
    labels = [next(iter(s)) for s in by_planted.values()]
    assert len(set(labels)) == 3, by_planted

    # deterministic: identical assignment on a second run
    again = {
        (r["vec_id"], r["cluster"])
        for r in similarity.kmeans_assign(
            df, "vec_id", "embedding", n_clusters=3, iterations=3
        ).collect()
    }
    assert again == {(r["vec_id"], r["cluster"]) for r in joined}


def test_last_touch_attribution_hand_case(spark):
    from png_from_pdf_extracter_spark.operators.sessions import (
        last_touch_attribution,
    )

    rows = [
        ("u1", 1, "click"),
        ("u1", 2, "purchase"),   # credit click
        ("u1", 3, "view"),
        ("u1", 4, "purchase"),   # credit view
        ("u1", 5, "purchase"),   # still view (purchases never credit)
        ("u2", 1, "purchase"),   # no prior touch -> direct
    ]
    df = spark.createDataFrame(rows, "user_id string, i long, t string")
    out = {
        r["channel"]: (r["n_conversions"], r["n_users"])
        for r in last_touch_attribution(
            df, "user_id", ("i",), "t", "purchase"
        ).collect()
    }
    assert out == {"click": (1, 1), "view": (2, 1), "direct": (1, 1)}


# ---- mutual_nn_pairs ----


def test_mutual_nn_pairs_planted_and_hub_filtered(spark):
    from png_from_pdf_extracter_spark.functions.similarity import (
        mutual_nn_pairs,
    )

    # planted mutual pairs: l_i ~ r_i (same direction, small noise);
    # r9 is a hub near the centroid of everything
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    left = [(i, unit(i * 0.7)) for i in range(5)]
    right = [(100 + i, unit(i * 0.7 + 0.01)) for i in range(5)]
    ldf = spark.createDataFrame(left, "vec_id long, embedding array<float>")
    rdf = spark.createDataFrame(right, "vec_id long, embedding array<float>")
    got = {
        (r["left_id"], r["right_id"])
        for r in mutual_nn_pairs(ldf, rdf).collect()
    }
    assert got == {(i, 100 + i) for i in range(5)}


def test_mutual_nn_pairs_asymmetric_top1_is_dropped(spark):
    from png_from_pdf_extracter_spark.functions.similarity import (
        mutual_nn_pairs,
    )

    # l0 and l1 both nearest to r0; r0's top-1 is l0 -> only (l0, r0)
    ldf = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    rdf = spark.createDataFrame(
        [(10, [1.0, 0.01]), (11, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in mutual_nn_pairs(ldf, rdf).collect()
    }
    assert (0, 10) in got
    assert (1, 10) not in got


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    from png_from_pdf_extracter_spark.functions.similarity import (
        hard_negatives,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.14], 0),   # same label as 0: never a negative
        (2, [0.95, 0.31], 1),   # closest different-label
        (3, [0.0, 1.0], 1),
        (4, [0.7, 0.7], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = df.filter(F.col("vec_id") == 0)
    out = sorted(
        hard_negatives(df, q, k=2).collect(), key=lambda r: r["rank"]
    )
    assert [r["neg_id"] for r in out] == [2, 4]
    assert out[0]["cos_sim"] > out[1]["cos_sim"]


# ---- candidate-fed (100-TB) paths for mutual-NN / hard negatives ----


def _synth_vecs(n, dim=6, seed=0, offset=0):
    """Deterministic pseudo-random unit-ish vectors (no RNG state)."""
    import math

    return [
        (
            offset + i,
            [math.sin(0.7 * (seed + i) * (d + 1) + d) for d in range(dim)],
        )
        for i in range(n)
    ]


def test_mutual_nn_candidate_path_equals_exact_on_full_graph(spark):
    # candidates = the COMPLETE bipartite graph -> the candidate path must
    # reproduce the exact path bit-for-bit (same rounding, same ties)
    from png_from_pdf_extracter_spark.functions.similarity import (
        mutual_nn_pairs,
    )

    ldf = spark.createDataFrame(
        _synth_vecs(12, seed=1), "vec_id long, embedding array<float>"
    )
    rdf = spark.createDataFrame(
        _synth_vecs(12, seed=2, offset=100),
        "vec_id long, embedding array<float>",
    )
    full = ldf.select(F.col("vec_id").alias("left_id")).crossJoin(
        rdf.select(F.col("vec_id").alias("right_id"))
    )
    exact = {
        (r["left_id"], r["right_id"], r["cos_sim"])
        for r in mutual_nn_pairs(ldf, rdf).collect()
    }
    cand = {
        (r["left_id"], r["right_id"], r["cos_sim"])
        for r in mutual_nn_pairs(ldf, rdf, candidates=full).collect()
    }
    assert exact == cand and len(exact) > 0


def test_mutual_nn_ivf_candidates_recall_floor(spark):
    # the production shape: ivf_topk generates directed candidates, the
    # mutual filter runs over them via id-keyed joins. On this fixture
    # (nprobe=2 of 4 cells, k=3 headroom for a top-1 decision) recall vs
    # the exact mutual set must clear the floor.
    from png_from_pdf_extracter_spark.functions.similarity import (
        ivf_topk,
        mutual_nn_pairs,
    )

    ldf = spark.createDataFrame(
        _synth_vecs(40, seed=3), "vec_id long, embedding array<float>"
    )
    rdf = spark.createDataFrame(
        _synth_vecs(40, seed=4, offset=1000),
        "vec_id long, embedding array<float>",
    )
    cand = ivf_topk(rdf, ldf, k=3, n_cells=4, nprobe=2).select(
        F.col("query_id").alias("left_id"),
        F.col("neighbor_id").alias("right_id"),
    )
    exact = {
        (r["left_id"], r["right_id"])
        for r in mutual_nn_pairs(ldf, rdf).collect()
    }
    approx = {
        (r["left_id"], r["right_id"])
        for r in mutual_nn_pairs(ldf, rdf, candidates=cand).collect()
    }
    assert len(exact) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, (recall, exact, approx)
    # a candidate-graph top-1 is still a SINGLE partner per node
    from collections import Counter

    lc = Counter(p[0] for p in approx)
    rc = Counter(p[1] for p in approx)
    assert all(v == 1 for v in lc.values())
    assert all(v == 1 for v in rc.values())


def test_mutual_nn_candidate_path_rejects_planted_hub(spark):
    # hub r99 sits in EVERY left's candidate list and wins most left-side
    # top-1s; its own top-1 is a single left, so at most ONE mutual pair
    # may contain it — the hub-rejection property must survive the
    # candidate-fed shape, not just the exact one.
    import math

    from png_from_pdf_extracter_spark.functions.similarity import (
        mutual_nn_pairs,
    )

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    left = [(i, unit(i * 0.05)) for i in range(8)]
    # hub at the centroid direction of the lefts; other rights far away
    right = [(99, unit(0.175))] + [
        (100 + i, unit(2.5 + i * 0.3)) for i in range(4)
    ]
    ldf = spark.createDataFrame(left, "vec_id long, embedding array<float>")
    rdf = spark.createDataFrame(right, "vec_id long, embedding array<float>")
    cand = ldf.select(F.col("vec_id").alias("left_id")).crossJoin(
        rdf.select(F.col("vec_id").alias("right_id"))
    )
    got = mutual_nn_pairs(ldf, rdf, candidates=cand).collect()
    hub_pairs = [r for r in got if r["right_id"] == 99]
    assert len(hub_pairs) == 1  # reciprocity kills the other 7


def test_mutual_nn_candidate_plan_has_no_broadcast_of_sides(spark):
    # the point of the candidate path: NO cartesian/broadcast-nested-loop
    # anywhere — vectors arrive via equi-joins only
    from png_from_pdf_extracter_spark.functions.similarity import (
        mutual_nn_pairs,
    )

    ldf = spark.createDataFrame(
        _synth_vecs(10, seed=5), "vec_id long, embedding array<float>"
    )
    rdf = spark.createDataFrame(
        _synth_vecs(10, seed=6, offset=50),
        "vec_id long, embedding array<float>",
    )
    cand = spark.createDataFrame(
        [(i, 50 + i) for i in range(10)], "left_id long, right_id long"
    )
    plan = (
        mutual_nn_pairs(ldf, rdf, candidates=cand)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hard_negatives_candidate_path_equals_exact_on_full_graph(spark):
    from png_from_pdf_extracter_spark.functions.similarity import (
        hard_negatives,
    )

    rows = [
        (i, v, i % 3) for i, v in _synth_vecs(15, seed=7)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = df.filter(F.col("vec_id") < 4)
    full = q.select(F.col("vec_id").alias("query_id")).crossJoin(
        df.select(F.col("vec_id").alias("neg_id"))
    )
    exact = {
        (r["query_id"], r["neg_id"], r["rank"], r["cos_sim"])
        for r in hard_negatives(df, q, k=3).collect()
    }
    cand = {
        (r["query_id"], r["neg_id"], r["rank"], r["cos_sim"])
        for r in hard_negatives(df, q, k=3, candidates=full).collect()
    }
    assert exact == cand and len(exact) == 12


def test_hard_negatives_ivf_candidates_recall_and_label_filter(spark):
    # k_cand headroom rule: IVF candidates at 4x k survive the same-label
    # discard and still cover the exact top-k for most queries
    from png_from_pdf_extracter_spark.functions.similarity import (
        hard_negatives,
        ivf_topk,
    )

    rows = [(i, v, i % 2) for i, v in _synth_vecs(60, seed=8)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = df.filter(F.col("vec_id") < 6)
    cand = ivf_topk(df, q, k=12, n_cells=4, nprobe=2).select(
        "query_id", F.col("neighbor_id").alias("neg_id")
    )
    exact = {
        (r["query_id"], r["neg_id"])
        for r in hard_negatives(df, q, k=3).collect()
    }
    approx_rows = hard_negatives(df, q, k=3, candidates=cand).collect()
    approx = {(r["query_id"], r["neg_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, (recall, exact, approx)
    # label filter holds on the candidate path too
    labels = {r["vec_id"]: r["label"] for r in df.collect()}
    for r in approx_rows:
        assert labels[r["neg_id"]] != labels[r["query_id"]]


def test_candidate_fed_registry_queries_embed_recall(spark):
    """r3 verdict #1 'done' gate: the candidate-fed registry twins run at
    fixture scale, return non-empty results, and embed a recall vs the
    exact baseline above the floor — recorded per row in the driver
    artifact."""
    import __spark_entry__ as em

    qs = em.queries()
    floors = {"q_mutual_nn_ivf": 0.5, "q_hard_negatives_ivf": 0.6}
    for key, floor in floors.items():
        rows = qs[key](spark, "/root/testdata/sf0.001").collect()
        assert rows, key
        recs = {r["recall_vs_exact"] for r in rows}
        assert len(recs) == 1  # one constant recall per run
        assert recs.pop() >= floor, (key, rows[:3])


def test_no_oracle_registry_queries_embed_quality_pins(spark):
    """r4 verdict #6 'done' gate: the two remaining no-oracle queries
    carry embedded quality columns (the recall_vs_exact pattern) with
    thresholds, so the driver's rows-only check observes quality, not
    just shape. q_kmeans: mean cos-to-centroid must beat the k=1
    global-mean baseline by a margin; q_pca_whiten: the whitened
    output's full covariance must be the identity to float precision."""
    import __spark_entry__ as em

    qs = em.queries()
    km = qs["q_kmeans"](spark, "/root/testdata/sf0.001").collect()
    assert km
    seps = {r["sep_vs_global"] for r in km}
    assert len(seps) == 1  # one constant pin per run
    assert seps.pop() >= 0.05, km[:3]
    pw = qs["q_pca_whiten"](spark, "/root/testdata/sf0.001").collect()
    assert pw
    devs = {r["max_abs_cov_dev"] for r in pw}
    assert len(devs) == 1
    assert devs.pop() <= 1e-6, pw[:3]


# ---- margin_pairs ----


def test_margin_pairs_planted_parallel_pairs(spark):
    from png_from_pdf_extracter_spark.functions.similarity import (
        margin_pairs,
    )
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    left = [(i, unit(i * 0.7)) for i in range(5)]
    right = [(100 + i, unit(i * 0.7 + 0.01)) for i in range(5)]
    ldf = spark.createDataFrame(left, "vec_id long, embedding array<float>")
    rdf = spark.createDataFrame(right, "vec_id long, embedding array<float>")
    out = margin_pairs(ldf, rdf, k=2).collect()
    assert {(r.left_id, r.right_id) for r in out} == {
        (i, 100 + i) for i in range(5)
    }
    # the true match scores above its neighborhood mean -> margin > 1
    assert all(r.margin > 1.0 for r in out)


def test_margin_pairs_hub_demoted_by_margin(spark):
    """A hub close to everything has a HIGH neighborhood mean, so its
    margin is ~1 even where its absolute cosine wins; the true parallel
    match keeps a clearly larger margin — the reason margin replaces raw
    cosine in mined-bitext scoring."""
    from png_from_pdf_extracter_spark.functions.similarity import (
        margin_pairs,
    )
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    # l0's true match r0 at tiny angle; hub r9 moderately close to ALL
    # left vectors (sits between them)
    ldf = spark.createDataFrame(
        [(0, unit(0.0)), (1, unit(1.2)), (2, unit(2.4))],
        "vec_id long, embedding array<float>",
    )
    rdf = spark.createDataFrame(
        [(100, unit(0.02)), (101, unit(1.22)), (102, unit(2.42)),
         (109, unit(1.2))],  # hub: exactly on l1, mid-range to others
        "vec_id long, embedding array<float>",
    )
    out = {r.left_id: r for r in margin_pairs(ldf, rdf, k=3).collect()}
    # l0 and l2 keep their true matches despite the hub's presence
    assert out[0].right_id == 100
    assert out[2].right_id == 102


def test_margin_pairs_candidate_path_equals_exact_on_full_graph(spark):
    from png_from_pdf_extracter_spark.functions.similarity import (
        margin_pairs,
    )
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    left = [(i, unit(i * 0.5)) for i in range(6)]
    right = [(100 + i, unit(i * 0.5 + 0.03)) for i in range(6)]
    ldf = spark.createDataFrame(left, "vec_id long, embedding array<float>")
    rdf = spark.createDataFrame(right, "vec_id long, embedding array<float>")
    full = spark.createDataFrame(
        [(l[0], r[0]) for l in left for r in right],
        "left_id long, right_id long",
    )
    exact = {
        (r.left_id, r.right_id, r.margin)
        for r in margin_pairs(ldf, rdf, k=3).collect()
    }
    fed = {
        (r.left_id, r.right_id, r.margin)
        for r in margin_pairs(ldf, rdf, k=3, candidates=full).collect()
    }
    assert exact == fed


def test_margin_pairs_candidate_plan_has_no_broadcast_of_sides(spark):
    from png_from_pdf_extracter_spark.functions.similarity import (
        margin_pairs,
    )

    ldf = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    rdf = spark.createDataFrame(
        [(100 + i, [float(i), 1.2]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    cand = spark.createDataFrame(
        [(i, 100 + i) for i in range(4)], "left_id long, right_id long"
    )
    out = margin_pairs(ldf, rdf, k=2, candidates=cand)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() == 4
