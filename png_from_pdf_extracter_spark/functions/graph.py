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

from pyspark.sql import DataFrame, functions as F


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
