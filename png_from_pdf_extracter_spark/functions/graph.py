"""Iterative graph algorithms as unrolled DataFrame plans.

The reference has no graph surface; a training-data pipeline does — link
graphs for crawl ranking, dedup-cluster graphs, citation graphs. The
representative op here is PageRank, implemented the way an iterative
algorithm should be on Spark: each iteration is ONE join + ONE aggregate
over the edge list (both key-partitioned on the node id, so AQE can reuse
the exchange), unrolled for a fixed iteration count, with no driver-side
collect anywhere.

Determinism: rank mass is kept in scaled BIGINT fixed-point (``scale`` =
1e9) and every division is integer division (``div``), so the result is
bit-exact across engines and across partitionings — floating-point sums
would be order-dependent and unverifiable against an SQL oracle. This is
also the trick production systems use to make iterative jobs replayable.

Scale notes:
- per-iteration cost is O(|E|) shuffled on dst — the same plan GraphX/
  Pregel executes; for many iterations, localCheckpoint() every ~10
  rounds truncates the growing lineage (caller's knob, ``checkpoint_every``).
- dangling nodes (no out-edges) simply leak their damped mass, the common
  simplified-PageRank convention; both the Spark plan and the SQL oracle
  implement exactly this.
- integer overflow headroom: sum of all ranks <= |V| * scale; with scale
  1e9 the 85x damping multiply stays under 2^63 for |V| up to ~1e8 nodes
  per partition-sum; raise/lower ``scale`` to trade precision vs headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**9,
    checkpoint_every: int = 0,
) -> DataFrame:
    """PageRank over ``edges(src, dst)`` with fixed-point arithmetic.

    rank_0(v) = scale
    rank_k(v) = (100-d)% * scale + d% * sum_{u->v} (rank_{k-1}(u) div deg(u))

    Returns (node, rank) with rank a BIGINT in [0, |V|*scale]. All
    arithmetic is integer (``div``), bit-exact across engines.
    """
    src = F.col("src")
    dst = F.col("dst")
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for i in range(iters):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges["src"] == ranks["node"])
            .select(dst.alias("node"), F.expr("rank div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_pct} * coalesce(in_sum, 0)) div 100"
                )
            ).cast("long").alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits(
    edges: DataFrame,
    iterations: int = 2,
    checkpoint_every: int = 0,
) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) over ``edges(src, dst)`` —
    PageRank's companion for link analysis: an AUTHORITY is pointed to by
    good hubs, a HUB points to good authorities.

        auth_k(v) = sum_{u->v} hub_{k-1}(u)
        hub_k(u)  = sum_{u->v} auth_k(v)

    Deliberately UNNORMALIZED integer arithmetic: classic HITS divides by
    the L2 norm each round purely to prevent value blow-up — the
    normalizer is one positive global scalar per round, so it cannot
    change any ranking. Dropping it keeps every score an exact BIGINT
    (bit-exact across engines/partitionings, SQL-oracle-checkable, the
    ``pagerank_fixed_point`` trick); magnitudes grow ~(avg degree)^(2k)
    per iteration, so the int64 headroom supports the usual handful of
    rounds on web-scale degree distributions (overflow = raise
    ``iterations`` consciously, not silently).

    Each half-step is ONE equi-join + ONE map-combinable aggregate over
    the edge list, shuffled on the node id — the Pregel plan shape; no
    driver-side state. ``checkpoint_every`` truncates lineage for long
    runs. Returns (node, hub, auth); nodes without out-/in-edges score 0
    on that axis.
    """
    src = F.col("src")
    dst = F.col("dst")
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
    )
    hub = nodes.select("node", F.lit(1).cast("long").alias("hub"))
    auth = None
    for i in range(iterations):
        a = (
            edges.join(hub, edges["src"] == hub["node"])
            .select(dst.alias("node"), "hub")
            .groupBy("node")
            .agg(F.sum("hub").alias("in_sum"))
        )
        auth = nodes.join(a, "node", "left").select(
            "node",
            F.coalesce("in_sum", F.lit(0)).cast("long").alias("auth"),
        )
        h = (
            edges.join(auth, edges["dst"] == auth["node"])
            .select(src.alias("node"), "auth")
            .groupBy("node")
            .agg(F.sum("auth").alias("out_sum"))
        )
        hub = nodes.join(h, "node", "left").select(
            "node",
            F.coalesce("out_sum", F.lit(0)).cast("long").alias("hub"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            hub = hub.localCheckpoint(eager=False)
            auth = auth.localCheckpoint(eager=False)
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0)).alias("hub"),
            F.coalesce("auth", F.lit(0)).alias("auth"),
        )
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation.

    ``edges(src, dst)`` is taken as an UNDIRECTED graph — direction,
    duplicates and self-loops are normalized away first. Returns
    ``(node, n_triangles)`` for every node that participates in at
    least one triangle.

    Scale design (the part that matters at web scale): the naive
    edge³ self-join explodes on hubs — a node of degree d generates
    O(d²) wedge candidates, and crawl/link graphs are power-law. The
    standard fix (node-iterator++ / Latapy) orients every edge from its
    lower-(degree, id) endpoint to the higher one; each triangle then
    has exactly ONE pivot with two out-edges, and every node's
    out-degree is bounded by O(sqrt(|E|)) on any graph. Wedges are
    enumerated from the oriented list (equi-join on the pivot), closed
    by one more equi-join against the oriented edge set — three
    shuffles total, all on node keys, no driver state.

    Determinism: pure set semantics end to end (distinct edges, exact
    BIGINT counts) — the DuckDB oracle can enumerate the same triangle
    set with the naive canonical a<b<c join and match hashes exactly.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    # orient lower-(deg, id) -> higher; a < b already, so the id
    # tie-break on equal degrees is simply a -> b
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # three consumers (both wedge sides + the closing-edge probe):
    # persist so the dedup/degree/orientation pipeline runs once, not
    # three times; released via dedup.release(result) after the action
    # (the attribute below is the repo-wide cached-deps contract)
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).persist()
    o1 = oriented.select(F.col("u").alias("p"), F.col("v").alias("x"))
    o2 = oriented.select(F.col("u").alias("p"), F.col("v").alias("y"))
    # each unordered out-neighbor pair appears in both (x,y) orders; the
    # closing edge exists in oriented in exactly ONE of them, so the
    # semi-join keeps each triangle exactly once
    wedges = o1.join(o2, "p").filter(F.col("x") != F.col("y"))
    tris = wedges.join(
        oriented,
        (wedges["x"] == oriented["u"]) & (wedges["y"] == oriented["v"]),
        "left_semi",
    )
    corners = tris.select(
        F.explode(F.array("p", "x", "y")).alias("node")
    )
    out = corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    out._spark_graft_cached = [oriented]  # dedup.release(out) unpersists
    return out


def bfs_hops(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Multi-source BFS over directed ``edges(src, dst)`` from
    ``seeds(node)``: returns ``(node, hops)`` — the minimum hop distance
    (<= max_hops) from any seed, seeds at 0. The k-hop neighborhood /
    crawl-frontier primitive.

    Frontier-style unrolled iteration: each round joins ONLY the nodes
    discovered last round against the edge list (the frontier), then
    min-combines — one node-keyed join + one aggregate per hop, the
    Pregel shape, no driver collect. Exact integers end to end, so the
    DuckDB recursive-CTE oracle matches bit-for-bit.
    """
    dist = seeds.select(
        F.col("node"), F.lit(0).cast("int").alias("hops")
    ).distinct()
    for i in range(max_hops):
        frontier = dist.filter(F.col("hops") == i)
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(
                edges["dst"].alias("node"),
                F.lit(i + 1).cast("int").alias("hops"),
            )
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        )
    return dist

def k_core(
    edges: DataFrame,
    k: int,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 50,
) -> DataFrame:
    """K-core decomposition for a fixed k: iteratively peel nodes of
    degree < k until the subgraph stabilizes — the standard "dense
    collaborative core vs drive-by periphery" filter (spam rings and
    one-shot accounts fall out of the 3-core; long-lived communities
    survive).

    Plan per round: symmetrize once up front, then degree aggregate →
    the PEELED node set (degree < k) → if empty, converged (the count
    action doubles as the convergence signal and fires BEFORE any join
    work) → else two BROADCAST anti-joins remove edges touching peeled
    nodes. The peeled set shrinks toward zero as peeling proceeds —
    anti-joining on it broadcasts a vanishing table, where semi-joining
    on the survivor set would shuffle the (large) keep list every
    round. Edge table persisted per round and released after — the
    iterative-operator hygiene shared with ``pagerank_fixed_point``;
    rounds bounded by ``max_iter`` (peeling strictly shrinks the edge
    set; real graphs stabilize in a handful of rounds). For graphs
    where a single round peels a large fraction of all nodes the
    broadcast would be big — Spark falls back to a shuffled anti-join
    past the broadcast threshold, same semantics.

    Returns surviving (node, degree) — the degree WITHIN the k-core.
    Empty result when no k-core exists. Self-loops are dropped (they
    inflate degree without adding a neighbor).
    """
    sym = (
        edges.filter(F.col(id1) != F.col(id2))
        .select(F.col(id1).alias("a"), F.col(id2).alias("b"))
        .unionByName(
            edges.filter(F.col(id1) != F.col(id2)).select(
                F.col(id2).alias("a"), F.col(id1).alias("b")
            )
        )
        .distinct()
        .persist()
    )
    cur = sym
    try:
        for _ in range(max_iter):
            deg = cur.groupBy("a").agg(F.count("*").alias("deg"))
            peeled = deg.filter(F.col("deg") < k).select("a").persist()
            if peeled.count() == 0:
                peeled.unpersist()
                break
            # localCheckpoint, not persist: each round's plan references
            # the previous round THREE times (the main edge stream plus
            # the two anti-join broadcast sides via `deg`), so without a
            # lineage CUT the logical plan grows ~3^rounds — a 5-round
            # peel was enough to OOM the driver on plan-tree strings
            # alone. Checkpointing makes every round's plan O(1); eager
            # materialization doubles as the round barrier.
            nxt = (
                cur.join(F.broadcast(peeled), "a", "left_anti")
                .join(
                    F.broadcast(peeled.select(F.col("a").alias("b"))),
                    "b",
                    "left_anti",
                )
                .localCheckpoint(eager=True)
            )
            peeled.unpersist()
            if cur is not sym:
                cur.unpersist()
            cur = nxt
    except Exception:
        sym.unpersist()
        raise
    out = cur.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    if cur is not sym:
        sym.unpersist()
    # the result reads `cur` (or sym when zero rounds peeled anything);
    # dedup.release(out) reclaims it after the consuming action
    out._spark_graft_cached = [cur]
    return out


def markov_attribution(
    df: DataFrame,
    user_col: str,
    order_cols: tuple[str, ...],
    channel_col: str,
    conversion_value: str,
) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    alternative to last-touch: model journeys as a first-order chain
    START -> channels -> {CONV, NULL}, and credit each channel by how
    much the conversion probability DROPS when that channel is removed
    (its in-edges redirected to NULL) — channels that merely appear in
    journeys earn nothing unless paths actually die without them.

    Plan: journeys truncate at the first conversion event (a min-over-
    window on the SAME user-key exchange as the ordering window);
    transition pairs come from one lead() — a single corpus shuffle.
    The transition-count matrix is (channels+3)^2 rows — CHANNEL
    cardinality, not corpus — and is the documented bounded collect
    (README driver-state budget): the absorbing-chain solve
    ``(I - Q) t = R`` runs in numpy on the driver, once per channel
    for the removals. Exact transition counts in, one float solve out;
    emitted floor-6dp. Returns (channel, removal_effect_ppm,
    attribution_ppm) — attribution is the share-normalized removal
    effect, the number marketing actually reports.
    """
    import numpy as np

    u = F.col(user_col)
    ch = F.col(channel_col).cast("string")
    ow = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(user_col).orderBy(*ow)
    full = Window.partitionBy(user_col)
    seq = df.select(
        u.alias("__u"),
        ch.alias("__c"),
        F.row_number().over(w).alias("__i"),
        F.min(
            F.when(ch == conversion_value, F.row_number().over(w))
        ).over(full).alias("__conv_i"),
    )
    # keep rows up to (and incl.) the first conversion; later rows are a
    # second journey in a longer model — out of scope for one-pass MC
    kept = seq.filter(
        F.col("__conv_i").isNull() | (F.col("__i") <= F.col("__conv_i"))
    )
    nxt = F.lead("__c").over(
        Window.partitionBy("__u").orderBy("__i")
    )
    trans = kept.select(
        "__u",
        "__i",
        F.col("__c").alias("src"),
        F.coalesce(
            nxt,
            F.when(F.col("__c") == conversion_value, F.lit("__CONV__"))
            .otherwise(F.lit("__NULL__")),
        ).alias("dst"),
    )
    start = kept.filter(F.col("__i") == 1).select(
        "__u", F.lit("__START__").alias("src"), F.col("__c").alias("dst")
    )
    # conversion rows self-classify: the conversion channel IS the CONV
    # absorption, so map it out of the transient space entirely
    conv = conversion_value
    counts = (
        trans.select("src", "dst")
        .unionByName(start.select("src", "dst"))
        .withColumn(
            "src",
            F.when(F.col("src") == conv, F.lit("__CONV__")).otherwise(
                F.col("src")
            ),
        )
        .withColumn(
            "dst",
            F.when(F.col("dst") == conv, F.lit("__CONV__")).otherwise(
                F.col("dst")
            ),
        )
        .filter(F.col("src") != "__CONV__")
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    )
    channels = sorted(
        {r["src"] for r in counts if r["src"] != "__START__"}
        | {
            r["dst"]
            for r in counts
            if r["dst"] not in ("__CONV__", "__NULL__")
        }
    )
    trans_states = ["__START__"] + channels
    idx = {s: i for i, s in enumerate(trans_states)}
    n = len(trans_states)
    Q = np.zeros((n, n))
    Rc = np.zeros(n)
    row_tot = {}
    for r in counts:
        row_tot[r["src"]] = row_tot.get(r["src"], 0) + r["n"]
    for r in counts:
        p = r["n"] / row_tot[r["src"]]
        i = idx[r["src"]]
        if r["dst"] == "__CONV__":
            Rc[i] += p
        elif r["dst"] == "__NULL__":
            pass
        else:
            Q[i, idx[r["dst"]]] += p

    def conv_prob(removed=None):
        q = Q.copy()
        rc = Rc.copy()
        if removed is not None:
            j = idx[removed]
            q[:, j] = 0.0  # in-edges -> NULL
            q[j, :] = 0.0
            rc[j] = 0.0
        t = np.linalg.solve(np.eye(n) - q, rc)
        return float(t[idx["__START__"]])

    base = conv_prob()
    effects = []
    for c in channels:
        pc = conv_prob(c)
        eff = 0.0 if base <= 0 else max(0.0, 1.0 - pc / base)
        effects.append((c, eff))
    tot = sum(e for _, e in effects)
    import math

    out = [
        (
            c,
            int(math.floor(e * 1e6)),
            int(math.floor((e / tot if tot > 0 else 0.0) * 1e6)),
        )
        for c, e in effects
    ]
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "channel string, removal_effect_ppm long, attribution_ppm long"
    )


def link_prediction_scores(
    edges: DataFrame,
    max_hub_degree: int = 10_000,
) -> DataFrame:
    """Common-neighbor link-prediction indices over an undirected graph
    ``edges(src, dst)``: for every node pair sharing at least one
    neighbor, the common-neighbor count, the Adamic-Adar score
    (sum over shared w of 1/ln(deg w) — rare shared neighbors count
    more) and the resource-allocation index (sum of 1/deg w, Zhou et
    al. — the integer-exact sibling that usually ranks better). Pairs
    already connected are flagged ``is_edge`` rather than dropped, so
    the same table serves link prediction (filter out) and edge
    strength (keep).

    Scale design: wedges are enumerated by the pivot join on the
    shared neighbor — a node of degree d emits O(d^2) pairs, and crawl
    graphs are power-law, so ``max_hub_degree`` DROPS pivots above the
    cap before the join (documented loss: a 10^6-degree hub adds only
    ~1/ln(10^6) = 0.07 per pair while generating 10^12 of them — the
    standard practice is to exclude hubs as evidence, not to pay for
    them). Three shuffles, all on node keys; no driver state.

    Determinism: deg-1 pivots cannot be common neighbors (they have
    one edge), so ln(deg) >= ln 2 > 0 always; both scores are BIGINT
    sums of PER-PIVOT quantized weights — aa_num = sum floor(1e6 /
    ln(deg_w)), ra_num = sum floor(1e9 / deg_w) — never a float sum
    over an unordered set. Returns (u, v, common_neighbors, aa_num,
    ra_num, is_edge) with u < v.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = und.select(
        F.col("a").alias("w"), F.col("b").alias("n")
    ).unionByName(und.select(F.col("b").alias("w"), F.col("a").alias("n")))
    deg = adj.groupBy("w").agg(F.count("*").cast("long").alias("deg"))
    pivots = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= max_hub_degree)
    ).select(
        "w",
        F.floor(F.lit(1e6) / F.log(F.col("deg").cast("double")))
        .cast("long")
        .alias("aa1"),
        F.floor(F.lit(1e9) / F.col("deg").cast("double"))
        .cast("long")
        .alias("ra1"),
    )
    wedged = adj.join(pivots, "w")
    lhs = wedged.select("w", F.col("n").alias("u"), "aa1", "ra1")
    rhs = wedged.select("w", F.col("n").alias("v"))
    pairs = lhs.join(rhs, "w").filter(F.col("u") < F.col("v"))
    scored = pairs.groupBy("u", "v").agg(
        F.count("*").cast("long").alias("common_neighbors"),
        F.sum("aa1").cast("long").alias("aa_num"),
        F.sum("ra1").cast("long").alias("ra_num"),
    )
    return scored.join(
        und.select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            F.lit(True).alias("is_edge"),
        ),
        ["u", "v"],
        "left",
    ).withColumn("is_edge", F.coalesce(F.col("is_edge"), F.lit(False)))


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Newman degree-assortativity coefficient of an undirected graph
    ``edges(src, dst)`` — the Pearson correlation of endpoint degrees
    across edges: positive means hubs attach to hubs (social-network
    shape), negative means hubs attach to leaves (web/crawl shape).
    The one-number summary that tells you whether hub-salting will be
    needed BEFORE you run the pair-generating operators above.

    EXACT cross-engine, zero transcendentals: with M edges and per-edge
    endpoint degrees (j, k), multiplying Newman's r through by 4M^2
    gives r = (4M*sum(jk) - sum(j+k)^2) / (2M*sum(j^2+k^2) -
    sum(j+k)^2) — every term an exact BIGINT from one combinable
    aggregate over the degree-joined edge list; ONE terminal division.
    Null when the denominator is zero (a regular graph — assortativity
    undefined). Plan: dedupe, two degree joins, one scalar aggregate.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    e = und.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(
        deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b"
    )
    agg = e.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("da") * F.col("db")).cast("long").alias("s_jk"),
        F.sum(F.col("da") + F.col("db")).cast("long").alias("s_sum"),
        F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db"))
        .cast("long")
        .alias("s_sq"),
    )
    num = 4 * F.col("m") * F.col("s_jk") - F.col("s_sum") * F.col("s_sum")
    den = 2 * F.col("m") * F.col("s_sq") - F.col("s_sum") * F.col("s_sum")
    return agg.select(
        "m",
        "s_jk",
        "s_sum",
        "s_sq",
        F.when(
            den != 0,
            F.floor(
                num.cast("double") / den.cast("double") * F.lit(1e6)
            )
            / F.lit(1e6),
        ).alias("r_q6"),
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """Seeded label propagation (semi-supervised label spreading):
    given sparse trusted labels on a few nodes, spread them through
    ``edges(src, dst)`` by synchronous majority vote — the curation
    move that turns 1% human-labeled quality/topic tags into
    graph-wide weak labels ([[bfs_hops]] spreads DISTANCE; this
    spreads the label itself, and a hub voting 60/40 stays contested
    rather than simply "reached").

    Semantics (pinned for the cross-engine oracle): edges are
    symmetrized; ``seeds(node, label)`` are CLAMPED (never change);
    every other node re-votes each round as the most frequent label
    among its labeled neighbors, ties broken by SMALLEST label; a node
    with no labeled neighbor keeps its previous label (null until
    first reached). Synchronous rounds + deterministic tie-break =>
    the output is a pure function of the graph, immune to partition
    or arrival order — and expressible as ``rounds`` unrolled SQL
    CTEs, so the full iteration is value-checked against DuckDB.

    Plan per round (Pregel shape): one edge->label join + one
    (node, label) vote aggregate + one argmax aggregate + one merge
    join. State is node-keyed DataFrames only; nothing collects to
    the driver. At 10^12 edges each round is two shuffles keyed by
    node id — the same budget as one [[pagerank_fixed_point]] step.

    Returns ``(node, label, is_seed)`` for all nodes that have a
    label after ``rounds`` rounds.
    """
    sym = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    cur = seeds.select(
        "node",
        F.col("label"),
        F.lit(True).alias("is_seed"),
    ).distinct()
    for _ in range(rounds):
        labeled = cur.select(
            F.col("node").alias("b"), F.col("label").alias("__nl")
        )
        votes = (
            sym.join(labeled, "b")
            .groupBy(F.col("a").alias("node"), F.col("__nl"))
            .agg(F.count("*").cast("long").alias("__c"))
        )
        best = votes.groupBy("node").agg(
            F.min(
                F.struct((-F.col("__c")).alias("nc"), F.col("__nl"))
            ).alias("__b")
        ).select("node", F.col("__b.__nl").alias("__vote"))
        cur = (
            cur.join(best, "node", "full")
            .select(
                "node",
                F.when(F.coalesce("is_seed", F.lit(False)), F.col("label"))
                .otherwise(F.coalesce("__vote", "label"))
                .alias("label"),
                F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
            )
        )
    return cur.filter(F.col("label").isNotNull())


def graph_profile(edges: DataFrame) -> DataFrame:
    """One-row structural profile of an edge list: node/edge counts,
    density, global clustering coefficient and directed reciprocity —
    the summary card read before any pair-generating operator (a high
    clustering or reciprocity number changes which dedup/link-pred
    strategies are safe).

    The input is read twice: as a DIRECTED graph for reciprocity
    (distinct non-loop arcs; r = reciprocated arcs / arcs) and as the
    undirected simplification for everything else. Global clustering
    is 3*triangles / wedges with triangles from [[triangle_count]]'s
    degree-oriented enumeration (hub-safe) and wedges = sum d(d-1)/2
    off the degree table — both BIGINTs, so every emitted ratio is
    one exact float expression. Plan: the triangle pipeline's node-key
    shuffles plus two tiny aggregates; no driver state.
    """
    arcs = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    canon = arcs.groupBy(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
    ).agg(F.count("*").alias("__dirs"))
    arc_stats = canon.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("__dirs").cast("long").alias("__n_arcs"),
        F.sum(F.when(F.col("__dirs") == 2, 2).otherwise(0))
        .cast("long")
        .alias("__recip"),
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    deg_stats = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum(F.col("deg") * (F.col("deg") - 1)).cast("long").alias(
            "__wedges2"
        ),
        F.max("deg").cast("long").alias("max_degree"),
    )
    tri_df = triangle_count(edges)
    tri_total = tri_df.agg(
        F.coalesce(F.sum("n_triangles"), F.lit(0))
        .cast("long")
        .alias("__tri3")
    )
    j = arc_stats.crossJoin(F.broadcast(deg_stats)).crossJoin(
        F.broadcast(tri_total)
    )
    n = F.col("n_nodes").cast("double")
    e = F.col("n_edges").cast("double")
    q6 = lambda c: F.floor(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    out = j.select(
        "n_nodes",
        "n_edges",
        "max_degree",
        (F.col("__tri3") / F.lit(3)).cast("long").alias("n_triangles"),
        q6(F.lit(2.0) * e / (n * (n - F.lit(1.0)))).alias("density_q6"),
        F.when(
            F.col("__wedges2") > 0,
            q6(
                F.col("__tri3").cast("double")
                * F.lit(2.0)
                / F.col("__wedges2").cast("double")
            ),
        ).alias("clustering_q6"),
        q6(
            F.col("__recip").cast("double")
            / F.col("__n_arcs").cast("double")
        ).alias("reciprocity_q6"),
    )
    # propagate triangle_count's persisted intermediate so
    # dedup.release(profile) reclaims it (repo cached-deps contract)
    out._spark_graft_cached = getattr(tri_df, "_spark_graft_cached", [])
    return out


def modularity(edges: DataFrame, communities: DataFrame) -> DataFrame:
    """Newman modularity Q of a given node partition over the
    undirected simple graph: how much denser are communities than a
    degree-preserving random rewiring? The quality read for ANY
    clustering the pipeline produced — [[label_propagation]] labels,
    connected-component dedup groups, topic buckets.

    The float-order trap (summing e_c/m - (d_c/2m)^2 over an
    unordered community set) is removed algebraically:
    Q = (4m * sum_c e_c - sum_c d_c^2) / (4m^2), where sum e_c
    (intra-community edges) and sum d_c^2 are BIGINT aggregates —
    ONE fixed float expression, no per-community float terms.
    ``communities`` is (node, community); unassigned endpoints drop
    their edges from the intra count but keep degree mass AND their
    edges in m (m_edges is counted off the FULL undirected simple
    edge set, not the label-joined table), matching the usual "rest
    is singleton" convention only when every node is labeled — pass
    a complete assignment. Plan: two node-key joins + three
    combinable aggregates. Returns one row
    (n_communities, m_edges, q_modularity_q6).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    ca = communities.select(
        F.col("node").alias("a"), F.col("community").alias("__cu")
    )
    cb = communities.select(
        F.col("node").alias("b"), F.col("community").alias("__cv")
    )
    intra = (
        und.join(ca, "a")
        .join(cb, "b")
        .agg(
            F.sum(
                F.when(F.col("__cu") == F.col("__cv"), 1).otherwise(0)
            )
            .cast("long")
            .alias("__sum_ec"),
        )
    )
    mtot = und.agg(F.count("*").cast("long").alias("m_edges"))
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("__deg"))
    )
    dc = (
        deg.join(
            communities.select("node", F.col("community").alias("__c")),
            "node",
        )
        .groupBy("__c")
        .agg(F.sum("__deg").cast("long").alias("__dc"))
    )
    dsum = dc.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum(F.col("__dc") * F.col("__dc")).cast("long").alias("__sdc2"),
    )
    j = intra.crossJoin(F.broadcast(mtot)).crossJoin(
        F.broadcast(dsum)
    )
    m = F.col("m_edges").cast("double")
    q6 = lambda c: F.floor(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return j.select(
        "n_communities",
        "m_edges",
        q6(
            (
                F.lit(4.0) * m * F.col("__sum_ec").cast("double")
                - F.col("__sdc2").cast("double")
            )
            / (F.lit(4.0) * m * m)
        ).alias("q_modularity_q6"),
    )


def rich_club(edges: DataFrame, k_values: tuple = (2, 4, 8)) -> DataFrame:
    """Rich-club coefficient phi(k) for each degree threshold: among
    nodes of degree > k, what fraction of possible edges exist? A
    rising phi(k) means hubs wire to each other — the structural
    signature that makes hub-keyed joins skew and candidate counts
    superlinear, so this is the scale-risk probe to run before
    pair-generating ops on a new graph.

    Integer end to end: n_k and e_k are counts off the degree-joined
    edge list; phi = 2 e_k / (n_k (n_k - 1)) is the only float.
    Plan: degree table joined back on both endpoints once, then one
    tiny aggregate per k (k list is a handful of literals). Returns
    (k, n_nodes_gt_k, n_edges_within, phi_q6) long form.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    e = und.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("__da")),
        "a",
    ).join(
        deg.select(F.col("node").alias("b"), F.col("deg").alias("__db")),
        "b",
    )
    rows = []
    for k in k_values:
        nk = deg.filter(F.col("deg") > k).agg(
            F.count("*").cast("long").alias("n_nodes_gt_k")
        )
        ek = e.filter(
            (F.col("__da") > k) & (F.col("__db") > k)
        ).agg(F.count("*").cast("long").alias("n_edges_within"))
        rows.append(
            nk.crossJoin(F.broadcast(ek)).select(
                F.lit(int(k)).alias("k"),
                "n_nodes_gt_k",
                "n_edges_within",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    n = F.col("n_nodes_gt_k").cast("double")
    q6 = lambda c: F.floor(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return out.select(
        "k",
        "n_nodes_gt_k",
        "n_edges_within",
        F.when(
            F.col("n_nodes_gt_k") >= 2,
            q6(
                F.lit(2.0)
                * F.col("n_edges_within").cast("double")
                / (n * (n - F.lit(1.0)))
            ),
        ).alias("phi_q6"),
    )
