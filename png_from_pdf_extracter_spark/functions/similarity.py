"""Embedding similarity search over an ``array<float>`` column.

- ``cosine_topk``: brute-force top-k — the exact baseline. The query side is
  small and broadcast; the corpus is scanned once; per-row math is
  ``zip_with`` + ``aggregate`` builtins (JVM-side, no Python). At 100 TB you
  shard the corpus by partition and take per-partition top-k before the
  global top-k (that is exactly what the window + filter plan compiles to
  under AQE partial aggregation).
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets via
  deterministic seeded planes; candidates = bucket equi-join, then exact
  rerank inside buckets. Planes are derived from md5 of (seed, dim) so both
  engines / both runs agree without RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.
    Returns (query_id, neighbor_id, rank, cos_sim). The queries side is
    broadcast (small dim table); ranking window is per query."""
    # norms precomputed per ROW below the join (a join is a projection
    # barrier, so they are not re-inlined per PAIR — O(n+q) norm
    # aggregates instead of O(n*q))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qn") * F.col("cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def hyperplanes(dim: int, n_planes: int):
    """Deterministic pseudo-random hyperplanes: component (p, d) is
    ``bigint(md5(f"{p}:{d}")[:15]) / 2^59 - 1`` in [-1, 1). Pure function —
    no RNG state, reproducible on any engine."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
            row.append(h / float(1 << 59) - 1.0)
        planes.append(row)
    return planes


def _probe_dim(df: DataFrame, vec_col: str) -> int:
    """Vector length from one row — costs a (tiny) Spark job. Callers that
    know the embedding dimension from their pipeline contract should pass
    ``dim`` explicitly and skip this."""
    first = df.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError(f"cannot probe dim: no rows / null {vec_col}")
    return len(first[0])


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: sign-of-dot-product with ``n_planes``
    deterministic hyperplanes -> bucket key; candidates share the bucket;
    exact rerank within. Misses across-bucket neighbors (the usual LSH
    recall trade) but replaces the cross join with an equi-join — the 100 TB
    path. ``dim``: embedding length; None -> probed with one extra job."""
    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    planes = hyperplanes(dim, n_planes)

    def bucket(vec) -> F.Column:
        bits = []
        for p in range(n_planes):
            plane = F.array(*[F.lit(x) for x in planes[p]])
            bits.append(
                F.when(_dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
                * F.lit(1 << p)
            )
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qn") * F.col("cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_coarse_centroids(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 16
):
    """Deterministic coarse centroids for IVF: the ``n_cells`` corpus
    vectors with smallest md5(id) — a seeded sample with no RNG state, same
    on every run/engine. (Real IVF runs a few k-means iterations; for the
    index structure and query path that follows, the quantizer's quality
    only affects recall, not correctness of the plumbing.) Returns a small
    driver-side list of (cell_idx, vector)."""
    rows = (
        corpus.select(
            F.col(id_col), F.col(vec_col),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h")
        .limit(n_cells)
        .collect()
    )
    return [(i, list(r[vec_col])) for i, r in enumerate(rows)]


def ivf_kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iterations: int = 2,
):
    """Lloyd-refined coarse centroids: seed with the deterministic md5
    sample, then ``iterations`` x (assign-to-nearest-cell, recompute cell
    means). Each iteration is one small Spark job (explode dims -> avg per
    (cell, dim) -> collect n_cells x dim rows to the driver). Empty cells
    keep their previous centroid. Float-sum order across partitions makes
    the means reproducible only to ~1e-12 — irrelevant for recall, which is
    why ivf_topk is rows-only checked rather than value-hashed."""
    cents = ivf_coarse_centroids(corpus, id_col, vec_col, n_cells)
    if not cents:
        return cents
    dim = len(cents[0][1])
    for _ in range(iterations):
        assigned = corpus.select(
            F.col(vec_col).alias("v"),
            F.array_min(_cell_candidates(F.col(vec_col), cents))["cell"].alias(
                "cell"
            ),
        )
        means = (
            assigned.select("cell", F.posexplode("v").alias("d", "x"))
            .groupBy("cell", "d")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["d"]] = r["m"]
        cents = [
            (
                idx,
                [by_cell[idx][d] for d in range(dim)]
                if idx in by_cell
                else old,
            )
            for idx, old in cents
        ]
    return cents


def _cell_candidates(vec, centroids) -> F.Column:
    """array<struct<neg_cos, cell>> for all cells — struct ordering sorts by
    first field, so array_min / array_sort pick nearest cells. Pure builtins."""
    cands = []
    for idx, cvec in centroids:
        plane = F.array(*[F.lit(float(x)) for x in cvec])
        cos = _dot(vec, plane) / (_norm(vec) * _norm(plane))
        cands.append(F.struct((-cos).alias("neg_cos"), F.lit(idx).alias("cell")))
    return F.array(*cands)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    kmeans_iterations: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus rows are assigned to their nearest
    coarse cell (inverted lists); each query probes its ``nprobe`` nearest
    cells and reranks exactly inside them. Candidates come from a cell
    equi-join — the other standard ANN scale path next to hyperplane LSH
    (``lsh_bucket_topk``). At 100 TB the corpus side is written bucketed by
    cell so the probe join prunes to nprobe/n_cells of the data.
    ``kmeans_iterations`` > 0 Lloyd-refines the coarse quantizer (better
    cell balance/recall at the cost of that many extra small jobs)."""
    if kmeans_iterations > 0:
        cents = ivf_kmeans_centroids(
            corpus, id_col, vec_col, n_cells, kmeans_iterations
        )
    else:
        cents = ivf_coarse_centroids(corpus, id_col, vec_col, n_cells)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.array_min(_cell_candidates(F.col(vec_col), cents))["cell"].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_cell_candidates(F.col(vec_col), cents)),
                    1, nprobe,
                ),
                lambda s: s["cell"],
            )
        ).alias("cell"),
    )
    scored = (
        c.withColumn("cn", _norm(F.col("cvec")))
        .join(F.broadcast(q.withColumn("qn", _norm(F.col("qvec")))), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qn") * F.col("cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def embedding_near_dup_exact(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id1 < id2,
    cos >= threshold) by self-join — the correctness baseline the LSH
    variant is measured against. O(n^2): run on a bounded slice or one
    LSH/IVF bucket; ``embedding_near_dup_pairs`` is the 100 TB path."""
    l = df.select(
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("v1"),
        _norm(F.col(vec_col)).alias("n1"),
    )
    r = df.select(
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("v2"),
        _norm(F.col(vec_col)).alias("n2"),
    )
    return (
        l.join(F.broadcast(r), F.col("id1") < F.col("id2"))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id1", "id2", "cos_sim")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact verify
    (id1 < id2, cos >= threshold). ``dim``: embedding length; None ->
    probed with one extra job."""
    if dim is None:
        dim = _probe_dim(df, vec_col)
    planes = hyperplanes(dim, n_planes)
    plane_cols = [F.array(*[F.lit(x) for x in p]) for p in planes]
    bucket = None
    for i, pc in enumerate(plane_cols):
        bit = F.when(_dot(F.col(vec_col), pc) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        ) * F.lit(1 << i)
        bucket = bit if bucket is None else bucket + bit
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("n"),
        bucket.alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("l.vec"), F.col("r.vec"))
                / (F.col("l.n") * F.col("r.n")),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("l.id").alias("id1"), F.col("r.id").alias("id2"), "cos_sim"
        )
    )
