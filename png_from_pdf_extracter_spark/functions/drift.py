"""Distribution-drift detection between two corpus snapshots: PSI.

The Population Stability Index is the standard production gate for
"did this week's ingest change the data distribution" — per group:
bucket the metric by the BASE snapshot's quantile edges, compare the
two snapshots' bucket shares p_b / p_c, and sum
``(p_c - p_b) * ln(p_c / p_b)``. Common reading: < 0.1 stable,
0.1-0.25 drifting, > 0.25 shifted.

Scale design: the only per-row work is one broadcast join against the
(groups x 1) edge-array table and a map-side bucket assignment
(``size(filter(edges, e -> x > e))`` — a JVM higher-order function, no
UDF); everything after operates on (groups x buckets) rows. Bucket
counts are map-combinable; the base-side quantile computation is the
same exact interpolated ``percentile`` the winsorize/profile operators
already pin against DuckDB's ``quantile_cont``. Laplace smoothing
((n + 0.5) / (N + 0.5k)) keeps empty buckets finite and is integer-
derived, so another engine reproduces the value bit-for-bit after
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def psi_drift(
    base: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """PSI of ``value_col`` between ``base`` and ``cur``, per
    ``group_col``. Returns (group, n_base, n_cur, psi) with psi rounded
    to 5. Groups must appear in both snapshots (inner join on the edge
    table; a group absent from base has no reference distribution)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # edges rounded to 4dp: interpolated quantiles can differ by 1 ulp
    # across engines, and a data value sitting exactly on an edge would
    # then flip buckets — rounding pins the boundary (the same rounded
    # percentile equality the winsorize oracle relies on)
    edges = base.groupBy(group_col).agg(
        F.transform(
            F.percentile(value_col, qs), lambda e: F.round(e, 4)
        ).alias("edges")
    )

    def buckets(df: DataFrame, out: str) -> DataFrame:
        b = (
            F.size(
                F.filter("edges", lambda e: F.col(value_col) > e)
            )
            + 1
        )
        return (
            df.join(F.broadcast(edges), group_col)
            .select(group_col, b.alias("bucket"))
            .groupBy(group_col, "bucket")
            .agg(F.count("*").alias(out))
        )

    bc = buckets(base, "n_b").join(
        buckets(cur, "n_c"), [group_col, "bucket"], "full_outer"
    ).select(
        group_col,
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.coalesce("n_c", F.lit(0)).alias("n_c"),
    )
    k = float(n_buckets)
    tot = bc.groupBy(group_col).agg(
        F.sum("n_b").alias("tb"), F.sum("n_c").alias("tc")
    )
    p_b = (F.col("n_b") + 0.5) / (F.col("tb") + 0.5 * k)
    p_c = (F.col("n_c") + 0.5) / (F.col("tc") + 0.5 * k)
    term = (p_c - p_b) * F.log(p_c / p_b)
    return (
        bc.join(F.broadcast(tot), group_col)
        .groupBy(group_col)
        .agg(
            F.min("tb").alias("n_base"),
            F.min("tc").alias("n_cur"),
            F.round(F.sum(term), 5).alias("psi"),
        )
    )


def ks_statistic(
    base: DataFrame,
    cur: DataFrame,
    value_col: str,
    quantize: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic — max |F_base(x) - F_cur(x)|
    over the pooled support — the distribution-free companion to PSI
    (PSI needs buckets and a stability threshold; KS is the sharp
    "are these the same distribution" number).

    EXACT cross-engine by construction: the max runs over INTEGER
    numerators |cum_base * n_cur - cum_cur * n_base| and the division
    happens once at the end, so the value hash cannot drift in float
    summation order. Plan shape: one map-combinable count per distinct
    value, then a running sum ordered by value. That window is a single
    partition over the DISTINCT-value table — bounded by cardinality,
    not corpus size; for continuous columns pass ``quantize`` (decimal
    places) to pre-bin values map-side, which is the binned-KS the
    monitoring literature uses at scale (statistic error <= bin width's
    CDF mass; exactness of the chosen estimator is preserved).

    Returns one row (n_base, n_cur, ks_num, ks) — ks = ks_num /
    (n_base * n_cur) exactly, rounded 6dp for the emitted double."""
    v = F.col(value_col)
    if quantize is not None:
        v = F.round(v.cast("double"), quantize)
    u = base.select(v.alias("v"), F.lit(1).alias("s")).unionByName(
        cur.select(v.alias("v"), F.lit(0).alias("s"))
    ).filter(F.col("v").isNotNull())
    cnt = u.groupBy("v").agg(
        F.sum("s").alias("cb"), F.sum(1 - F.col("s")).alias("cc")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = cnt.select(
        F.sum("cb").over(w).alias("kb"), F.sum("cc").over(w).alias("kc")
    )
    totals = F.broadcast(
        cnt.agg(F.sum("cb").alias("nb"), F.sum("cc").alias("nc"))
    )
    return (
        cum.crossJoin(totals)
        .agg(
            F.max(
                F.abs(F.col("kb") * F.col("nc") - F.col("kc") * F.col("nb"))
            ).alias("ks_num"),
            F.max("nb").alias("n_base"),
            F.max("nc").alias("n_cur"),
        )
        .select(
            "n_base",
            "n_cur",
            "ks_num",
            F.round(
                F.col("ks_num") / (F.col("n_base") * F.col("n_cur")), 6
            ).alias("ks"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    anchors: int = 256,
    quantize: int = 0,
) -> DataFrame:
    """Quantile normalization across groups: every group's value
    distribution is mapped onto the POOLED distribution, so a value at
    the p-th percentile of its source lands on the pooled p-th
    percentile — the batch-effect remover (microarray heritage) that
    puts per-source quality/length scores on one comparable scale
    before cross-source thresholding.

    Construction (all integer until the final emit): values are
    quantized to BIGINT (``round(v * 10^quantize)``); the pooled
    empirical CDF is one distinct-value aggregation plus ONE ordered
    window over the distinct-value table (bounded by quantized-value
    cardinality — quantize coarser for continuous metrics, the same
    cardinality contract as the rank statistics); ``anchors+1`` pooled
    quantile anchors sit at integer positions ``floor(b*(N-1)/B)+1``.
    Instead of joining every anchor against the CDF (O(C*B)), each
    distinct value computes the exact integer range of anchor indices
    it answers — ``cum_prev < pos_b <= cum`` inverted to a [b_min,
    b_max] sequence — and explodes it: O(C) work emitting exactly B+1
    anchor rows. Per-row, the within-group rank maps to anchor
    ``floor((i-1)*B/(n_g-1))`` (mid anchor for singleton groups) and a
    broadcast join against the B+1-row anchor table yields the
    normalized value. Ties inside a group are ordered by ``id_col`` —
    deterministic, engine-independent.

    All index products stay below 2^53 for corpora under ~2^53/B rows
    (exact in the double floor both engines share). Returns (group, id,
    value_q, norm_q).
    """
    if anchors < 1:
        raise ValueError("anchors must be >= 1")
    B = anchors
    vq = F.round(
        F.col(value_col).cast("double") * F.lit(10 ** quantize), 0
    ).cast("long")
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        vq.alias("vq"),
    ).filter(F.col("vq").isNotNull())
    pooled = vals.groupBy("vq").agg(F.count("*").cast("long").alias("c"))
    cumw = Window.orderBy("vq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumt = pooled.select(
        "vq", "c", F.sum("c").over(cumw).alias("cum")
    )
    total = F.broadcast(pooled.agg(F.sum("c").cast("long").alias("N")))
    with_n = cumt.crossJoin(total)
    # anchor index range this distinct value answers (N > 1 branch):
    #   b_min = ceil(B*cum_prev/(N-1)),  b_max = (B*cum - 1) div (N-1)
    cum_prev = F.col("cum") - F.col("c")
    nm1 = F.col("N") - F.lit(1)
    b_min = F.when(F.col("N") == 1, F.lit(0)).otherwise(
        F.greatest(
            F.lit(0),
            F.floor(
                (F.lit(B) * cum_prev + nm1 - F.lit(1)) / nm1
            ).cast("long"),
        )
    )
    b_max = F.when(F.col("N") == 1, F.lit(B)).otherwise(
        F.least(
            F.lit(B).cast("long"),
            F.floor((F.lit(B) * F.col("cum") - F.lit(1)) / nm1).cast(
                "long"
            ),
        )
    )
    anchor = (
        with_n.select(
            "vq",
            F.explode(
                F.when(
                    b_min <= b_max, F.sequence(b_min, b_max)
                ).otherwise(F.array().cast("array<long>"))
            ).alias("b"),
        )
        .groupBy("b")
        .agg(F.min("vq").alias("anchor_vq"))
    )
    grp = Window.partitionBy("g")
    rk = Window.partitionBy("g").orderBy(F.col("vq").asc(), F.col("id").asc())
    ranked = vals.select(
        "g",
        "id",
        "vq",
        F.row_number().over(rk).alias("i"),
        F.count("*").over(grp).alias("ng"),
    )
    rowb = ranked.select(
        "g",
        "id",
        "vq",
        F.when(F.col("ng") == 1, F.lit(B // 2).cast("long"))
        .otherwise(
            F.floor(
                (F.col("i") - 1) * F.lit(B) / (F.col("ng") - 1)
            ).cast("long")
        )
        .alias("b"),
    )
    scale = float(10 ** quantize)
    return rowb.join(F.broadcast(anchor), "b").select(
        "g",
        "id",
        (F.col("vq") / F.lit(scale)).alias("value_q"),
        (F.col("anchor_vq") / F.lit(scale)).alias("norm_q"),
    )


def wasserstein_1d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    quantize: int = 2,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 distance (earth mover's distance)
    between two samples — the drift metric that, unlike PSI/KS, reports
    HOW FAR the mass moved in value units, not just that it moved:
    ``W1 = ∫ |F_a(v) - F_b(v)| dv`` over the empirical CDFs.

    Exact-integer construction (the [[ks_statistic]] family): values
    quantized to the 10^-quantize grid, per-distinct-value counts, one
    ordered running sum. Each inter-value step contributes
    ``|cumA*n_b - cumB*n_a| * (v_i - v_{i-1})`` — a DECIMAL(38,0)
    integer — and the total divides ONCE by ``n_a*n_b*10^quantize`` at
    the emit. No cross-row float summation anywhere: the whole integral
    is an integer until the final expression.

    Plan: map-combinable distinct-value counts, then ONE ordered window
    over the distinct-value table (bounded by value cardinality, the
    module's contract). Returns one row: (n_a, n_b, emd_q) floor-6dp.
    """
    v = F.round(
        F.col(value_col).cast("double") * F.lit(10 ** quantize), 0
    ).cast("long")
    g = F.col(group_col)
    pooled = (
        df.filter(g.isin([group_a, group_b]))
        .select(
            v.alias("v"),
            F.when(g == group_a, F.lit(1)).otherwise(F.lit(0)).alias("s"),
        )
        .filter(F.col("v").isNotNull())
    )
    cnt = pooled.groupBy("v").agg(
        F.sum("s").cast("long").alias("ca"),
        F.sum(1 - F.col("s")).cast("long").alias("cb"),
    )
    upto = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = cnt.select(
        "v",
        F.sum("ca").over(upto).alias("cumA"),
        F.sum("cb").over(upto).alias("cumB"),
        F.lag("v").over(Window.orderBy("v")).alias("v_prev"),
        F.lag(F.sum("ca").over(upto)).over(Window.orderBy("v")).alias(
            "pA"
        ),
        F.lag(F.sum("cb").over(upto)).over(Window.orderBy("v")).alias(
            "pB"
        ),
    )
    dec = "decimal(38,0)"
    step = (
        F.abs(
            F.col("pA").cast(dec) * F.col("__nb").cast(dec)
            - F.col("pB").cast(dec) * F.col("__na").cast(dec)
        )
        * (F.col("v") - F.col("v_prev")).cast(dec)
    )
    totals = F.broadcast(
        cnt.agg(
            F.sum("ca").cast("long").alias("__na"),
            F.sum("cb").cast("long").alias("__nb"),
        )
    )
    emd_int = (
        run.crossJoin(totals)
        .filter(F.col("v_prev").isNotNull())
        .agg(F.sum(step).alias("__emd_int"))
    )
    scale = float(10 ** quantize)
    # totals survive even when there are zero inter-value steps (a
    # single distinct value => distance exactly 0, not NULL)
    return totals.crossJoin(F.broadcast(emd_int)).select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        F.when(
            (F.col("__na") > 0) & (F.col("__nb") > 0),
            F.floor(
                F.coalesce(
                    F.col("__emd_int"), F.lit(0).cast("decimal(38,0)")
                ).cast("double")
                / (
                    F.col("__na").cast("double")
                    * F.col("__nb").cast("double")
                    * F.lit(scale)
                )
                * F.lit(1e6)
            )
            / F.lit(1e6),
        ).alias("emd_q"),
    )
