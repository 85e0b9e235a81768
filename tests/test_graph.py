"""Fixed-point PageRank (functions/graph.py) — hand-checked on a tiny
graph, plus the invariants that matter at scale: determinism across
partitionings (the reason for integer arithmetic) and rank ordering on a
known topology."""

from pyspark.sql import Row

from png_from_pdf_extracter_spark.functions.graph import pagerank_fixed_point

SCALE = 10**9


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=s, dst=d) for s, d in pairs])


def test_pagerank_hand_computed(spark):
    # a -> b, a -> c, b -> c : c must outrank b, b must outrank a after 1 it
    e = _edges(spark, [(0, 1), (0, 2), (1, 2)])
    r = {
        row["node"]: row["rank"]
        for row in pagerank_fixed_point(e, iters=1).collect()
    }
    base = 15 * SCALE // 100
    # a: no in-edges -> base; b: half of a's rank damped; c: half a + all b
    assert r[0] == base
    assert r[1] == base + 85 * (SCALE // 2) // 100
    assert r[2] == base + 85 * (SCALE // 2 + SCALE) // 100


def test_pagerank_sink_accumulates(spark):
    # star into node 9: it must hold the top rank, sources share the floor
    e = _edges(spark, [(i, 9) for i in range(5)])
    r = {
        row["node"]: row["rank"]
        for row in pagerank_fixed_point(e, iters=3).collect()
    }
    assert max(r, key=r.get) == 9
    assert len({r[i] for i in range(5)}) == 1  # symmetric sources tie exactly


def test_pagerank_partitioning_invariant(spark):
    """Bit-exact under different partition counts — float PageRank can't
    promise this; the fixed-point form is why the oracle hash works."""
    pairs = [(i % 17, (i * 7) % 13) for i in range(200) if i % 17 != (i * 7) % 13]
    a = pagerank_fixed_point(
        _edges(spark, pairs).repartition(1), iters=4
    ).collect()
    b = pagerank_fixed_point(
        _edges(spark, pairs).repartition(16), iters=4, checkpoint_every=2
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------------- triangles

def test_triangle_count_k4(spark):
    """K4 has 4 triangles; every node sits in exactly 3."""
    from png_from_pdf_extracter_spark.functions.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = {
        row["node"]: row["n_triangles"]
        for row in triangle_count(_edges(spark, k4)).collect()
    }
    assert r == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_square_and_star_have_none(spark):
    from png_from_pdf_extracter_spark.functions.graph import triangle_count

    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    star = [(9, i) for i in range(5)]
    assert triangle_count(_edges(spark, square)).count() == 0
    assert triangle_count(_edges(spark, star)).count() == 0


def test_triangle_count_direction_and_dupes_normalized(spark):
    """Reversed duplicates and self-loops must not create or double-count
    triangles — the input contract is 'any directed multi-edge dump'."""
    from png_from_pdf_extracter_spark.functions.graph import triangle_count

    messy = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 2), (0, 0)]
    r = {
        row["node"]: row["n_triangles"]
        for row in triangle_count(_edges(spark, messy)).collect()
    }
    assert r == {0: 1, 1: 1, 2: 1}


def test_triangle_count_hub_orientation(spark):
    """A hub fanning to many leaves plus one closing edge: exactly one
    triangle, and the degree orientation keeps the hub's out-degree at
    zero wedge work (all hub edges point INTO the hub)."""
    from png_from_pdf_extracter_spark.functions.graph import triangle_count

    hub = [(100, i) for i in range(20)] + [(0, 1)]
    r = {
        row["node"]: row["n_triangles"]
        for row in triangle_count(_edges(spark, hub)).collect()
    }
    assert r == {0: 1, 1: 1, 100: 1}


# ------------------------------------------------------------- BFS hops

def _seeds(spark, nodes):
    from pyspark.sql import Row
    return spark.createDataFrame([Row(node=n) for n in nodes])


def test_bfs_hops_path_graph(spark):
    from png_from_pdf_extracter_spark.functions.graph import bfs_hops

    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    r = {
        row["node"]: row["hops"]
        for row in bfs_hops(e, _seeds(spark, [0]), max_hops=3).collect()
    }
    assert r == {0: 0, 1: 1, 2: 2, 3: 3}  # node 4 beyond max_hops


def test_bfs_hops_takes_minimum_over_paths(spark):
    from png_from_pdf_extracter_spark.functions.graph import bfs_hops

    # long way 0->1->2->3 and shortcut 0->3
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    r = {
        row["node"]: row["hops"]
        for row in bfs_hops(e, _seeds(spark, [0]), max_hops=3).collect()
    }
    assert r[3] == 1


def test_bfs_hops_multi_source_and_cycle(spark):
    from png_from_pdf_extracter_spark.functions.graph import bfs_hops

    e = _edges(spark, [(0, 1), (1, 0), (1, 2), (7, 2)])
    r = {
        row["node"]: row["hops"]
        for row in bfs_hops(e, _seeds(spark, [0, 7]), max_hops=3).collect()
    }
    assert r == {0: 0, 7: 0, 1: 1, 2: 1}  # cycle does not inflate


def test_triangle_count_releases_cached_oriented(spark):
    """triangle_count persists the oriented edge list (three consumers);
    dedup.release must reclaim it after the action."""
    from png_from_pdf_extracter_spark.functions import dedup
    from png_from_pdf_extracter_spark.functions.graph import triangle_count

    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    out = triangle_count(
        _edges(spark, [(a, b) for a in range(4) for b in range(4) if a < b])
    )
    out.count()
    dedup.release(out)
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before, f"leaked cached RDDs: {after - before}"


# ---- k-core ----

from pyspark.sql import functions as F  # noqa: E402

from png_from_pdf_extracter_spark.functions.graph import k_core


def _kc_edges(spark, pairs):
    return spark.createDataFrame(pairs, "id1 long, id2 long")


def test_kcore_triangle_survives_tail_peeled(spark):
    # triangle 1-2-3 plus a tail 3-4-5: the 2-core is exactly the
    # triangle (4 and 5 peel off in cascade — degree-1 removal of 5
    # drops 4 to degree 1)
    e = _kc_edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    out = {r["node"]: r["degree"] for r in k_core(e, 2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_when_no_core_exists(spark):
    # a path has no 2-core
    e = _kc_edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert k_core(e, 2).count() == 0


def test_kcore_clique_is_its_own_core_and_selfloops_ignored(spark):
    # K4 plus a self-loop and a pendant: 3-core = the K4, degrees 3
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = _kc_edges(spark, k4 + [(2, 2), (4, 9)])
    out = {r["node"]: r["degree"] for r in k_core(e, 3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_invariant_on_derived_graph(spark):
    # the defining property on a real-shaped graph: every surviving
    # node's degree within the survivor set is >= k
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    e = (
        o.select(
            F.col("o_custkey").alias("id1"),
            (F.col("o_orderkey") % 150).alias("id2"),
        )
        .filter(F.col("id1") != F.col("id2"))
        .distinct()
    )
    core = k_core(e, 3)
    assert core.filter(F.col("degree") < 3).count() == 0
    # and it is non-vacuous on this graph
    assert core.count() > 0


def test_kcore_oracle_unroll_margin(spark):
    """The q_kcore DuckDB oracle unrolls 16 peel rounds as chained CTEs
    and is only the fixpoint while actual convergence <= 16. Guard the
    margin: simulate the peel on the EXACT q_kcore edge derivation
    (modulus n/3, k=4) at sf0.001 and assert convergence within HALF the
    unroll — if a testdata regen ever pushes the cascade past 8 rounds,
    this fails before the driver's oracle comparison silently drifts."""
    from collections import Counter

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    mod = o.count() // 3
    rows = (
        o.select(
            (F.col("o_orderkey") % mod).alias("a"),
            ((F.col("o_orderkey") * 7 + F.col("o_custkey")) % mod).alias(
                "b"
            ),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .collect()
    )
    edges = set()
    for r in rows:
        edges.add((r["a"], r["b"]))
        edges.add((r["b"], r["a"]))
    rounds = 0
    while True:
        deg = Counter(a for a, _ in edges)
        bad = {n for n, d in deg.items() if d < 4}
        if not bad:
            break
        rounds += 1
        assert rounds <= 8, "peel cascade exceeds half the oracle unroll"
        edges = {
            (a, b) for a, b in edges if a not in bad and b not in bad
        }
    assert edges, "4-core vanished — q_kcore would compare empty/empty"
    # the Spark operator agrees with the simulated fixpoint
    e = spark.createDataFrame(
        [(a, b) for a, b in edges if a < b], "id1 long, id2 long"
    )
    got = {r["node"]: r["degree"] for r in k_core(e, 4).collect()}
    assert got == dict(Counter(a for a, _ in edges))


# ---- markov_attribution ----

from png_from_pdf_extracter_spark.functions.graph import (  # noqa: E402
    markov_attribution,
)


def _journeys(spark, rows):
    data = [
        (u, i, c) for u, chans in rows for i, c in enumerate(chans)
    ]
    return spark.createDataFrame(data, "u string, i long, c string")


def test_markov_single_channel_gets_full_credit(spark):
    # every conversion goes through 'a'; 'b' never converts
    df = _journeys(
        spark,
        [("u1", ["a", "buy"]), ("u2", ["a", "buy"]), ("u3", ["b"])],
    )
    out = {
        r["channel"]: r
        for r in markov_attribution(df, "u", ("i",), "c", "buy").collect()
    }
    assert out["a"]["removal_effect_ppm"] == 1_000_000
    assert out["a"]["attribution_ppm"] == 1_000_000
    assert out["b"]["removal_effect_ppm"] == 0


def test_markov_hand_computed_chain(spark):
    # START -> a (2/3) | b (1/3); a -> buy always; b -> null always
    df = _journeys(
        spark,
        [("u1", ["a", "buy"]), ("u2", ["a", "buy"]), ("u3", ["b"])],
    )
    # base P(conv) = 2/3; removing a: 0 -> effect 1; removing b: still
    # 2/3 -> effect 0. Hand-check a second topology:
    df2 = _journeys(
        spark,
        [
            ("u1", ["a", "b", "buy"]),
            ("u2", ["b", "buy"]),
            ("u3", ["a"]),
            ("u4", ["b"]),
        ],
    )
    out = {
        r["channel"]: r
        for r in markov_attribution(df2, "u", ("i",), "c", "buy").collect()
    }
    # transitions: START->a 1/2, START->b 1/2; a->b 1/2, a->NULL 1/2;
    # b->buy 2/3, b->NULL 1/3.
    # base = P(a)*P(a->b)*2/3 + P(b)*2/3 = (1/2*1/2 + 1/2) * 2/3 = 1/2
    # remove a: P = 1/2 * 2/3 = 1/3 -> effect 1 - (1/3)/(1/2) = 1/3
    # remove b: P = 0 -> effect 1
    import math

    assert out["a"]["removal_effect_ppm"] == math.floor(1 / 3 * 1e6)
    assert out["b"]["removal_effect_ppm"] == 1_000_000
    tot = 1 / 3 + 1.0
    # solve()'s float path can land a hair either side of the closed
    # form; 1 ppm tolerance on the SHARE (the raw effects are exact)
    assert abs(out["b"]["attribution_ppm"] - 1.0 / tot * 1e6) <= 1


def test_markov_journey_truncates_at_first_conversion(spark):
    # events after the first 'buy' must not create transitions ('c'
    # would otherwise earn credit from a post-conversion visit)
    df = _journeys(spark, [("u1", ["a", "buy", "c", "buy"])])
    out = {
        r["channel"]
        for r in markov_attribution(df, "u", ("i",), "c", "buy").collect()
    }
    assert out == {"a"}


# ---- link prediction / assortativity ----

from png_from_pdf_extracter_spark.functions.graph import (  # noqa: E402
    degree_assortativity,
    link_prediction_scores,
)


def test_link_prediction_closed_form(spark):
    import math

    # path graph 1-2-3 plus edge 2-4: pairs sharing neighbor 2 are
    # (1,3), (1,4), (3,4); deg(2) = 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "src long, dst long"
    )
    out = {
        (r["u"], r["v"]): r
        for r in link_prediction_scores(edges).collect()
    }
    assert set(out) == {(1, 3), (1, 4), (3, 4)}
    aa = math.floor(1e6 / math.log(3))
    ra = math.floor(1e9 / 3)
    for pair in out.values():
        assert pair["common_neighbors"] == 1
        assert pair["aa_num"] == aa and pair["ra_num"] == ra
        assert pair["is_edge"] is False


def test_link_prediction_is_edge_and_multiplicity(spark):
    # triangle 1-2-3 plus 1-4, 3-4: pair (1,3) is an edge and shares
    # neighbors {2, 4}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4), (3, 4)], "src long, dst long"
    )
    out = {
        (r["u"], r["v"]): r
        for r in link_prediction_scores(edges).collect()
    }
    r13 = out[(1, 3)]
    assert r13["common_neighbors"] == 2 and r13["is_edge"] is True


def test_link_prediction_hub_cap_drops_pivot(spark):
    # star center 0 with 5 leaves: cap at 4 removes all wedge pairs
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    assert link_prediction_scores(edges, max_hub_degree=4).count() == 0
    assert link_prediction_scores(edges).count() == 10  # C(5,2)


def test_assortativity_star_is_negative_one(spark):
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    r = degree_assortativity(edges).collect()[0]
    assert r["r_q6"] == -1.0 and r["m"] == 4


def test_assortativity_regular_graph_null(spark):
    # 4-cycle: every degree 2 -> undefined
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert degree_assortativity(edges).collect()[0]["r_q6"] is None


def test_assortativity_matches_networkx_formula(spark):
    # hand graph; reference via the stub-based Newman formula
    el = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(el, "src long, dst long")
    from collections import Counter

    deg = Counter()
    for a, b in el:
        deg[a] += 1
        deg[b] += 1
    m = len(el)
    s_jk = sum(deg[a] * deg[b] for a, b in el)
    s_sum = sum(deg[a] + deg[b] for a, b in el)
    s_sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in el)
    import math

    ref = math.floor(
        (4 * m * s_jk - s_sum**2)
        / (2 * m * s_sq - s_sum**2)
        * 1e6
    ) / 1e6
    assert degree_assortativity(edges).collect()[0]["r_q6"] == ref


def test_label_propagation_two_camps(spark):
    from png_from_pdf_extracter_spark.functions.graph import (
        label_propagation,
    )

    # two cliques bridged by one edge; one seed per clique
    e = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    edges = spark.createDataFrame(e, "src long, dst long")
    seeds = spark.createDataFrame(
        [(1, "red"), (12, "blue")], "node long, label string"
    )
    out = {
        r["node"]: (r["label"], r["is_seed"])
        for r in label_propagation(edges, seeds, rounds=3).collect()
    }
    assert out[1] == ("red", True) and out[12] == ("blue", True)
    assert out[2][0] == "red" and out[3][0] == "red"
    assert out[10][0] == "blue" and out[11][0] == "blue"


def test_label_propagation_tie_break_and_clamp(spark):
    from png_from_pdf_extracter_spark.functions.graph import (
        label_propagation,
    )

    # node 5 sees one 'a' and one 'b' neighbor -> smallest label wins
    edges = spark.createDataFrame(
        [(1, 5), (2, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(1, "b"), (2, "a")], "node long, label string"
    )
    out = {
        r["node"]: r["label"]
        for r in label_propagation(edges, seeds, rounds=1).collect()
    }
    assert out[5] == "a"
    # seeds never flip even when outvoted
    edges2 = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (9, 4)], "src long, dst long"
    )
    seeds2 = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y")],
        "node long, label string",
    )
    out2 = {
        r["node"]: r["label"]
        for r in label_propagation(edges2, seeds2, rounds=2).collect()
    }
    assert out2[4] == "y" and out2[9] == "x"


def test_graph_profile_hand_graph(spark):
    from png_from_pdf_extracter_spark.functions.graph import graph_profile

    # triangle 1-2-3 plus pendant 3-4; arcs include one mutual pair
    arcs = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 4)]
    df = spark.createDataFrame(arcs, "src long, dst long")
    r = graph_profile(df).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 4
    assert r["n_triangles"] == 1 and r["max_degree"] == 3
    # density 2*4/(4*3) = 2/3
    assert abs(r["density_q6"] - 2.0 / 3.0) < 2e-6
    # wedges: deg (2,2,3,1) -> sum d(d-1) = 2+2+6+0 = 10 ->
    # clustering = 3*1*2/10 = 0.6
    assert abs(r["clustering_q6"] - 0.6) < 2e-6
    # 5 arcs, 2 reciprocated -> 0.4
    assert abs(r["reciprocity_q6"] - 0.4) < 2e-6


def test_modularity_planted_vs_hash(spark):
    from png_from_pdf_extracter_spark.functions.graph import modularity

    # two 5-cliques joined by one bridge
    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((0, 5))
    df = spark.createDataFrame(edges, "src long, dst long")
    good = spark.createDataFrame(
        [(n, n // 5) for n in range(10)], "node long, community long"
    )
    bad = spark.createDataFrame(
        [(n, n % 2) for n in range(10)], "node long, community long"
    )
    qg = modularity(df, good).collect()[0]
    qb = modularity(df, bad).collect()[0]
    assert qg["m_edges"] == 21 and qg["n_communities"] == 2
    # hand value: sum_ec=20; per-community degree sum = 4*4+5 = 21,
    # so sum_dc2 = 2*21^2 = 882; Q = (4*21*20 - 882)/(4*441)
    assert abs(qg["q_modularity_q6"] - (4 * 21 * 20 - 882) / 1764.0) < 2e-6
    assert qg["q_modularity_q6"] > 0.4
    assert qb["q_modularity_q6"] < 0.1


def test_modularity_partial_assignment_keeps_full_m(spark):
    """Unlabeled endpoints must drop edges from the intra count only:
    m_edges stays the FULL undirected simple edge count, so sum(d_c)
    can never exceed 2m's accounting basis (the documented
    semantics)."""
    from png_from_pdf_extracter_spark.functions.graph import modularity

    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((0, 5))
    df = spark.createDataFrame(edges, "src long, dst long")
    # label only the first clique; second clique's 10 edges and the
    # bridge leave the intra count but NOT m
    part = spark.createDataFrame(
        [(n, 0) for n in range(5)], "node long, community long"
    )
    r = modularity(df, part).collect()[0]
    assert r["m_edges"] == 21
    assert r["n_communities"] == 1
    # sum_ec = 10 (clique-0 edges), d_c = 4*4 + 5 = 21
    assert abs(r["q_modularity_q6"] - (4 * 21 * 10 - 441) / 1764.0) < 2e-6


def test_rich_club_clique_core(spark):
    from png_from_pdf_extracter_spark.functions.graph import rich_club

    # 4-clique core (deg >= 3) + 6 pendants on node 0
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    edges += [(0, 10 + p) for p in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["k"]: r for r in rich_club(df, k_values=(2, 4, 8)).collect()}
    # deg: node0=9, nodes1-3=3, pendants=1
    assert out[2]["n_nodes_gt_k"] == 4
    assert out[2]["n_edges_within"] == 6
    assert abs(out[2]["phi_q6"] - 1.0) < 2e-6  # the club IS a clique
    assert out[4]["n_nodes_gt_k"] == 1 and out[4]["phi_q6"] is None
    assert out[8]["n_nodes_gt_k"] == 1
