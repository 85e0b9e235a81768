"""Count-min sketch: mergeable approximate frequency state.

Exact heavy hitters (``q_top_words``) need a shuffle keyed by every
distinct term; at 100 TB the distinct-term state itself is the problem.
The CMS bounds that state to depth x width integer cells regardless of
cardinality, merges across batches/partitions by cell-wise addition
(the property that makes it a streaming/incremental aggregate), and
answers point frequency queries with a one-sided error: estimate >= true
count, overshoot <= N * e / width with probability 1 - (1/2)^depth.

Determinism: cell assignment is md5-derived (``h_d(x) = md5("{d}:" + x)
mod width``) and all counts are integers, so sketches and estimates are
bit-exact across engines — the DuckDB oracle recomputes the identical
sketch. No floats anywhere.

Plan shape: building is explode(depth cells) -> ONE combinable groupBy
(map-side partial sums collapse each partition to <= depth*width rows
before the exchange — the sketch property doing its job in-plan).
Estimation joins the candidate items' cells against the sketch
(broadcast: the sketch is at most depth*width rows) and takes min over
depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cell(item, d: int, width: int):
    """Row of the d-th hash: md5("{d}:"+item) first 8 hex chars mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{d}:"), item)), 1, 8), 16, 10
    ).cast("long")
    return h % width


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Sketch of the multiset in ``item_col`` -> (d, w, cnt) cells.
    At most depth*width rows, regardless of input cardinality."""
    item = F.col(item_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(item, d, width).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(F.col("c.d").alias("d"), F.col("c.w").alias("w")).agg(
        F.count("*").alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — the mergeability that lets per-batch / per-shard
    sketches combine into a corpus sketch without re-reading data."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point frequency estimates for ``items[item_col]``: min over the
    depth cells each item hashes into. The sketch side is tiny
    (<= depth*width rows) and broadcast, so this is map-only over items."""
    item = F.col(item_col)
    cells = items.select(
        item.alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cell(item, d, width).alias("w")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("item", F.col("c.d").alias("d"), F.col("c.w").alias("w"))
    return (
        cells.join(F.broadcast(sketch), ["d", "w"], "left")
        # an absent cell means nothing ever hashed there: its count is 0,
        # and min(0, ...) correctly reports an unseen item as 0
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
