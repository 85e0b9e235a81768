"""Weighted quantiles (functions/stats.py) — closed-form pins. All
integer arithmetic, so the assertions are exact, never approx."""

from png_from_pdf_extracter_spark.functions.stats import weighted_quantile


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long, w long")


def test_weighted_median_weight_concentration(spark):
    # value 100 holds 8/10 of the weight: the weighted median is 100
    # even though it is the largest of four values
    rows = [("a", 1, 1), ("a", 2, 1), ("a", 3, 0), ("a", 100, 8)]
    r = weighted_quantile(
        _df(spark, rows), "v", "w", group_cols=("g",)
    ).collect()[0]
    assert r["wq_value"] == 100 and r["total_w"] == 10


def test_weighted_median_unit_weights_is_lower_median(spark):
    rows = [("a", v, 1) for v in (10, 20, 30, 40)]
    r = weighted_quantile(
        _df(spark, rows), "v", "w", group_cols=("g",)
    ).collect()[0]
    assert r["wq_value"] == 20  # lower median: cumw 2 reaches 4/2


def test_weighted_quantile_rational_q(spark):
    rows = [("a", v, 1) for v in range(1, 11)]  # 1..10, unit weights
    r = weighted_quantile(
        _df(spark, rows), "v", "w", group_cols=("g",), q_num=9, q_den=10
    ).collect()[0]
    assert r["wq_value"] == 9  # cumw 9 reaches 10*9/10


def test_weighted_median_exact_boundary(spark):
    # cumw*2 == total*1 exactly at value 1 (weight 1 of total 2): the
    # LOWER weighted median takes it — integer compare, no float fuzz
    rows = [("a", 1, 1), ("a", 5, 1)]
    r = weighted_quantile(
        _df(spark, rows), "v", "w", group_cols=("g",)
    ).collect()[0]
    assert r["wq_value"] == 1


# ---- rank statistics (mann_whitney_u / spearman_corr / autocorr_lag1) ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    autocorr_lag1,
    mann_whitney_u,
    spearman_corr,
)


def _mw_df(spark, a_vals, b_vals):
    rows = [("A", float(v)) for v in a_vals] + [
        ("B", float(v)) for v in b_vals
    ]
    return spark.createDataFrame(rows, "grp string, v double")


def test_mann_whitney_complete_separation(spark):
    r = mann_whitney_u(
        _mw_df(spark, [3, 4], [1, 2]), "v", "grp", "A", "B"
    ).collect()[0]
    # every A beats every B: U_a = n_a*n_b = 4, AUC = 1.0
    assert (r["u2_a"], r["u2_b"], r["auc_a"]) == (8, 0, 1.0)
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]


def test_mann_whitney_all_ties_is_half(spark):
    r = mann_whitney_u(
        _mw_df(spark, [5, 5], [5, 5]), "v", "grp", "A", "B"
    ).collect()[0]
    # full tie block: U_a = U_b = n_a*n_b/2, AUC = 0.5
    assert r["u2_a"] == r["u2_b"] == 4 and r["auc_a"] == 0.5


def test_mann_whitney_identity_holds_with_mixed_ties(spark):
    r = mann_whitney_u(
        _mw_df(spark, [1, 2, 2, 7], [2, 3, 3]), "v", "grp", "A", "B"
    ).collect()[0]
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"] == 24


def _xy_df(spark, pairs):
    return spark.createDataFrame(
        [(float(x), float(y)) for x, y in pairs], "x double, y double"
    )


def test_spearman_perfect_monotone_nonlinear(spark):
    pairs = [(x, x * x) for x in range(1, 11)]
    r = spearman_corr(_xy_df(spark, pairs), "x", "y").collect()[0]
    assert r["rho"] == 1.0  # rank-equal despite nonlinearity
    # doubled-rank sums are each exactly n*(n+1)
    assert r["sx2"] == r["sy2"] == 10 * 11


def test_spearman_perfect_inverse(spark):
    pairs = [(x, -x) for x in range(1, 8)]
    r = spearman_corr(_xy_df(spark, pairs), "x", "y").collect()[0]
    assert r["rho"] == -1.0


def test_spearman_constant_margin_is_null(spark):
    pairs = [(x, 5) for x in range(1, 6)]
    r = spearman_corr(_xy_df(spark, pairs), "x", "y").collect()[0]
    assert r["rho"] is None and r["n_pairs"] == 5


def _seq_df(spark, vals):
    return spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "k string, i long, v double",
    )


def test_autocorr_alternating_is_minus_one(spark):
    r = autocorr_lag1(
        _seq_df(spark, [1, 0, 1, 0, 1, 0]), ("k",), ("i",), "v"
    ).collect()[0]
    assert r["r1"] == -1.0 and r["n_pairs"] == 5


def test_autocorr_linear_is_plus_one(spark):
    r = autocorr_lag1(
        _seq_df(spark, [1, 2, 3, 4, 5]), ("k",), ("i",), "v"
    ).collect()[0]
    assert r["r1"] == 1.0 and r["n_pairs"] == 4


def test_autocorr_constant_is_null(spark):
    r = autocorr_lag1(
        _seq_df(spark, [7, 7, 7, 7]), ("k",), ("i",), "v"
    ).collect()[0]
    assert r["r1"] is None


# ---- running_distinct / changepoint_single ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    changepoint_single,
    running_distinct,
)


def test_running_distinct_hand_sequence(spark):
    df = spark.createDataFrame(
        [("u", i, v) for i, v in enumerate(["a", "b", "a", "c", "b", "d"])],
        "k string, i long, v string",
    )
    out = running_distinct(df, ("k",), ("i",), "v").orderBy("i").collect()
    assert [r["n_distinct"] for r in out] == [1, 2, 2, 3, 3, 4]


def test_running_distinct_final_equals_count_distinct(spark):
    df = spark.createDataFrame(
        [("u", i, f"v{i % 7}") for i in range(50)],
        "k string, i long, v string",
    )
    last = (
        running_distinct(df, ("k",), ("i",), "v")
        .orderBy(F.desc("i"))
        .first()
    )
    assert last["n_distinct"] == 7


def test_changepoint_clean_step(spark):
    vals = [0, 0, 0, 10, 10, 10]
    df = spark.createDataFrame(
        [("u", i, float(v)) for i, v in enumerate(vals)],
        "k string, i long, v double",
    )
    r = changepoint_single(df, ("k",), ("i",), "v").collect()[0]
    assert r["k_star"] == 3
    assert (r["mean_left"], r["mean_right"]) == (0.0, 10.0)


def test_changepoint_constant_ties_break_to_smallest_k(spark):
    df = spark.createDataFrame(
        [("u", i, 5.0) for i in range(6)], "k string, i long, v double"
    )
    r = changepoint_single(df, ("k",), ("i",), "v").collect()[0]
    assert r["k_star"] == 2 and r["bss_q2"] == 0.0


def test_changepoint_short_groups_dropped(spark):
    df = spark.createDataFrame(
        [("u", i, float(i)) for i in range(3)], "k string, i long, v double"
    )
    assert changepoint_single(df, ("k",), ("i",), "v").count() == 0


# needed by the appended tests above
from pyspark.sql import functions as F  # noqa: E402


# ---- benford_digits ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    benford_digits,
)


def test_benford_digit_extraction_and_shares(spark):
    # values whose 2dp quantization leads with known digits, incl. the
    # libm trap case 10.00 -> q=1000 -> digit 1 (log10 would misfire)
    vals = [1.23, 10.00, 0.19, 2.5, 29.9, 0.0, -3.0]  # 0/neg excluded
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r["n"] for r in benford_digits(df, "v").collect()}
    assert out == {1: 3, 2: 2}  # 123,1000,19 -> 1; 250,2990 -> 2
    rows = {r["digit"]: r for r in benford_digits(df, "v").collect()}
    assert rows[1]["share_q"] == 0.6  # 3 of 5 positive-quantized rows
    import math

    assert rows[1]["expected_q"] == math.floor(
        math.log10(2) * 1e6
    ) / 1e6


def test_benford_grouped_totals_are_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.5), ("b", 9.0)], "g string, v double"
    )
    out = {
        (r["g"], r["digit"]): r["share_q"]
        for r in benford_digits(df, "v", ("g",)).collect()
    }
    assert out == {("a", 1): 1.0, ("b", 9): 1.0}


# ---- rolling_median ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    rolling_median,
)


def test_rolling_median_hand_sequence(spark):
    # values 10,90,20,80,30 window 3: frames [10],[10,90],[10,20,90],
    # [20,80,90],[20,30,80] -> lower medians 10,10,20,80,30
    df = spark.createDataFrame(
        [("u", i, float(v)) for i, v in enumerate([10, 90, 20, 80, 30])],
        "k string, i long, v double",
    )
    out = (
        rolling_median(df, ("k",), ("i",), "v", window_rows=3)
        .orderBy("i")
        .collect()
    )
    assert [r["med_q"] for r in out] == [1000, 1000, 2000, 8000, 3000]


def test_rolling_median_even_frame_takes_lower(spark):
    # frame [10,20] -> ceil(2/2)=1 -> lower middle, no averaging
    df = spark.createDataFrame(
        [("u", 0, 20.0), ("u", 1, 10.0)], "k string, i long, v double"
    )
    out = (
        rolling_median(df, ("k",), ("i",), "v", window_rows=5)
        .orderBy("i")
        .collect()
    )
    assert [r["med_q"] for r in out] == [2000, 1000]


# ---- correlogram ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    correlogram,
)


def test_correlogram_lag1_matches_autocorr_and_period2_signal(spark):
    # perfect period-2 alternation: r(1) = -1, r(2) = +1
    df = spark.createDataFrame(
        [("u", i, float(v)) for i, v in enumerate([1, 0] * 6)],
        "k string, i long, v double",
    )
    out = {
        r["lag"]: r["r"]
        for r in correlogram(df, ("k",), ("i",), "v", max_lag=3).collect()
    }
    assert out[1] == -1.0 and out[2] == 1.0 and out[3] == -1.0
    lag1 = autocorr_lag1(df, ("k",), ("i",), "v").collect()[0]["r1"]
    assert out[1] == lag1


def test_correlogram_lag_beyond_sequence_absent_or_null(spark):
    df = spark.createDataFrame(
        [("u", i, float(i)) for i in range(3)], "k string, i long, v double"
    )
    rows = correlogram(df, ("k",), ("i",), "v", max_lag=5).collect()
    lags = {r["lag"] for r in rows}
    assert 5 not in lags and 4 not in lags  # no pairs exist


# ---- kaplan_meier ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    kaplan_meier,
)


def _km(spark, obs):
    df = spark.createDataFrame(obs, "t long, e int")
    return {
        r["duration"]: r
        for r in kaplan_meier(df, "t", "e").collect()
    }


def test_km_textbook_no_censoring(spark):
    # deaths at t=1,2,3 out of 3: S = 2/3, 1/3, 0
    out = _km(spark, [(1, 1), (2, 1), (3, 1)])
    assert out[1]["n_at_risk"] == 3
    assert abs(out[1]["survival_q"] - 2 / 3) < 1e-5
    assert abs(out[2]["survival_q"] - 1 / 3) < 1e-5
    assert out[3]["survival_q"] == 0.0


def test_km_censoring_removes_from_risk_without_step(spark):
    # death at 1 (n=4 -> S=3/4), censor at 2 (no step), death at 3
    # with n=2 -> S = 3/4 * 1/2 = 3/8
    out = _km(spark, [(1, 1), (2, 0), (3, 1), (4, 0)])
    assert abs(out[1]["survival_q"] - 0.75) < 1e-5
    assert out[2]["survival_q"] == out[1]["survival_q"]  # censor: flat
    assert abs(out[3]["survival_q"] - 0.375) < 1e-5
    assert out[4]["c_censored"] == 1


def test_km_survival_monotone_nonincreasing(spark):
    obs = [(t, t % 2) for t in range(1, 30)]
    rows = sorted(_km(spark, obs).items())
    survs = [r["survival_q"] for _, r in rows]
    assert all(a >= b for a, b in zip(survs, survs[1:]))


# ---- gini_concentration ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    gini_concentration,
    poisson_bootstrap_ci,
)


def test_gini_uniform_is_zero(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 10), ("d", 10)], "g string, w long"
    )
    r = gini_concentration(df, "g", "w").collect()[0]
    assert r["gini_ppm"] == 0
    assert r["hhi_ppm"] == 250000  # 4 * (1/4)^2
    assert r["top_share_ppm"] == 250000


def test_gini_total_concentration(spark):
    # one group holds everything except epsilon: G -> (n-1)/n
    df = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0), ("d", 100)], "g string, w long"
    )
    r = gini_concentration(df, "g", "w").collect()[0]
    assert r["gini_ppm"] == 750000  # 3/4 exactly
    assert r["hhi_ppm"] == 1000000
    assert r["top_share_ppm"] == 1000000


def test_gini_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    rows = [(f"g{i}", rng.randrange(0, 500)) for i in range(40)]
    ws = sorted(w for _, w in rows)
    n, W = len(ws), sum(ws)
    iw = sum((i + 1) * w for i, w in enumerate(ws))
    expect = (2 * iw - (n + 1) * W) / (n * W)
    df = spark.createDataFrame(rows, "g string, w long")
    r = gini_concentration(df, "g", "w").collect()[0]
    import math

    assert r["gini_ppm"] == math.floor(expect * 1e6)
    assert r["n_groups"] == n and r["total_w"] == W


def test_gini_sums_duplicate_group_rows(spark):
    # rows of the same group must be summed before ranking
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 10)], "g string, w long"
    )
    r = gini_concentration(df, "g", "w").collect()[0]
    assert r["n_groups"] == 2 and r["gini_ppm"] == 0


# ---- poisson_bootstrap_ci ----


def test_bootstrap_constant_data_collapses(spark):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(200)], "id long, v double"
    )
    r = poisson_bootstrap_ci(df, "id", "v", replicas=16).collect()[0]
    assert r["mean_ppm"] == r["ci_lo_ppm"] == r["ci_hi_ppm"] == 5_000_000
    assert r["n_replicas"] == 16


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    import random

    rng = random.Random(3)
    rows = [(i, rng.uniform(0, 10)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = poisson_bootstrap_ci(df, "id", "v", replicas=24).collect()[0]
    b = (
        poisson_bootstrap_ci(
            df.repartition(7), "id", "v", replicas=24
        ).collect()[0]
    )
    assert a == b  # repartition-invariant (pure hash draw)
    true_mean = sum(v for _, v in rows) / len(rows) * 1e6
    assert a["ci_lo_ppm"] <= true_mean <= a["ci_hi_ppm"]
    assert a["ci_lo_ppm"] < a["ci_hi_ppm"]
    # CI half-width should be in the vicinity of 1.96*sigma/sqrt(n)
    import statistics

    se = statistics.pstdev([v for _, v in rows]) / (len(rows) ** 0.5)
    width = (a["ci_hi_ppm"] - a["ci_lo_ppm"]) / 1e6
    assert 0.5 * se < width < 8 * se


def test_bootstrap_grouped_and_validated(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i % 7)) for i in range(100)],
        "id long, g string, v double",
    )
    out = poisson_bootstrap_ci(
        df, "id", "v", group_cols=("g",), replicas=8
    ).collect()
    assert {r["g"] for r in out} == {"g0", "g1"}
    for r in out:
        assert r["ci_lo_ppm"] <= r["mean_ppm"] <= r["ci_hi_ppm"]
    import pytest

    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "id", "v", replicas=1)
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "id", "v", alpha_num=1, alpha_den=2)


# ---- theil_sen_slope ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    theil_sen_slope,
)


def test_theil_sen_exact_line(spark):
    # y = 3x + 1: every pairwise slope is exactly 3
    df = spark.createDataFrame(
        [("g", x, 3.0 * x + 1.0) for x in range(10)],
        "g string, x long, y double",
    )
    r = theil_sen_slope(df, ("g",), "x", "y").collect()[0]
    assert r["slope_ppm"] == 3_000_000
    assert r["n_pairs"] == 45


def test_theil_sen_bruteforce_and_outlier_robust(spark):
    import math
    import random

    rng = random.Random(13)
    rows = [("g", x, 2.0 * x + rng.uniform(-0.1, 0.1)) for x in range(20)]
    rows[5] = ("g", 5, 1000.0)  # gross outlier
    df = spark.createDataFrame(rows, "g string, x long, y double")
    r = theil_sen_slope(df, ("g",), "x", "y").collect()[0]
    slopes = sorted(
        math.floor(
            (round(y2 * 1e6) - round(y1 * 1e6)) / (x2 - x1)
        )
        for i, (_, x1, y1) in enumerate(rows)
        for (_, x2, y2) in rows[i + 1 :]
        if x2 > x1
    )
    n = len(slopes)
    # lower median: smallest s with cum*2 >= n
    expect = next(
        s for k, s in enumerate(slopes) if (k + 1) * 2 >= n
    )
    assert r["slope_ppm"] == expect
    # robust: the outlier barely moves the slope off 2
    assert abs(r["slope_ppm"] / 1e6 - 2.0) < 0.2


def test_theil_sen_equal_x_pairs_excluded(spark):
    df = spark.createDataFrame(
        [("g", 1, 0.0), ("g", 1, 100.0), ("g", 2, 1.0)],
        "g string, x long, y double",
    )
    r = theil_sen_slope(df, ("g",), "x", "y").collect()[0]
    assert r["n_pairs"] == 2  # (1,0)-(2,1) and (1,100)-(2,1)


# ---- changepoint_binary_seg ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    changepoint_binary_seg,
)


def _binseg_reference(vals, K, min_seg=2, quantize=1):
    """Greedy binary segmentation in plain python (exact integers)."""
    q = [round(v * 10 ** quantize) for v in vals]
    segs = [(0, len(q))]  # [start, end) 0-based
    splits = []
    for _ in range(K):
        best = None  # (bss, abs_idx, seg_i)
        for si, (a, b) in enumerate(segs):
            seg = q[a:b]
            n = len(seg)
            st = sum(seg)
            sl = 0
            for k in range(1, n + 1):
                sl += seg[k - 1]
                if k < min_seg or k > n - min_seg:
                    continue
                nl, nr = k, n - k
                c = sl * nr - (st - sl) * nl
                bss = (float(c) * float(c)) / float(nl * nr)
                abs_idx = a + k  # 1-based absolute split row
                cand = (bss, -abs_idx, si, abs_idx)
                if best is None or (cand[0], cand[1]) > (
                    best[0], best[1]
                ):
                    best = cand
        if best is None:
            break
        _, _, si, abs_idx = best
        a, b = segs[si]
        segs[si : si + 1] = [(a, abs_idx), (abs_idx, b)]
        splits.append(abs_idx)
    segs.sort()
    return segs


def test_binseg_recovers_two_planted_shifts(spark):
    vals = [0.0] * 10 + [50.0] * 10 + [100.0] * 10
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "g string, i long, v double",
    )
    rows = sorted(
        changepoint_binary_seg(
            df, ("g",), ("i",), "v", max_changepoints=2
        ).collect(),
        key=lambda r: r["start_idx"],
    )
    assert [(r["start_idx"], r["end_idx"]) for r in rows] == [
        (1, 10), (11, 20), (21, 30)
    ]
    assert [r["mean_q"] for r in rows] == [0.0, 50.0, 100.0]
    assert [r["segment"] for r in rows] == [0, 1, 2]


def test_binseg_matches_bruteforce(spark):
    import random

    rng = random.Random(21)
    vals = [rng.uniform(0, 10) for _ in range(15)] + [
        rng.uniform(40, 50) for _ in range(12)
    ] + [rng.uniform(20, 25) for _ in range(9)]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "g string, i long, v double",
    )
    rows = sorted(
        changepoint_binary_seg(
            df, ("g",), ("i",), "v", max_changepoints=3
        ).collect(),
        key=lambda r: r["start_idx"],
    )
    expect = _binseg_reference(vals, 3)
    assert [(r["start_idx"] - 1, r["end_idx"]) for r in rows] == expect


def test_binseg_zero_changepoints_and_multigroup(spark):
    df = spark.createDataFrame(
        [("a", i, float(i > 4) * 10) for i in range(10)]
        + [("b", i, 1.0) for i in range(6)],
        "g string, i long, v double",
    )
    none_rows = changepoint_binary_seg(
        df, ("g",), ("i",), "v", max_changepoints=0
    ).collect()
    assert len(none_rows) == 2  # one segment per group
    rows = changepoint_binary_seg(
        df, ("g",), ("i",), "v", max_changepoints=2, min_bss=1.0
    ).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r)
    # 'a' splits at the planted step; constant 'b' has bss 0 < min_bss
    assert len(by_g["a"]) >= 2 and len(by_g["b"]) == 1
    a_rows = sorted(by_g["a"], key=lambda r: r["start_idx"])
    assert a_rows[0]["end_idx"] == 5


def test_gini_scoped_matches_per_scope_unscoped(spark):
    # each scope's scoped row equals running unscoped on that slice
    df = spark.createDataFrame(
        [("en", "a", 10), ("en", "b", 30), ("de", "a", 5), ("de", "c", 5)],
        "lang string, g string, w long",
    )
    scoped = {
        r["lang"]: r
        for r in gini_concentration(
            df, "g", "w", scope_cols=("lang",)
        ).collect()
    }
    for lang in ("en", "de"):
        solo = gini_concentration(
            df.filter(F.col("lang") == lang), "g", "w"
        ).collect()[0]
        assert scoped[lang]["gini_ppm"] == solo["gini_ppm"]
        assert scoped[lang]["hhi_ppm"] == solo["hhi_ppm"]
    assert scoped["de"]["gini_ppm"] == 0


# ---- kruskal_wallis ----


def test_kruskal_wallis_two_group_closed_form(spark):
    # a=[1,2], b=[3,4]: ranks 1..4, R_a=3, R_b=7
    # H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 2.4; no ties -> same corrected
    from png_from_pdf_extracter_spark.functions.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)],
        "g string, v double",
    )
    r = kruskal_wallis(df, "v", "g", quantize=0).collect()[0]
    assert (r["n"], r["k"], r["tie3"]) == (4, 2, 0)
    # floor-6dp of the IEEE double (12*29/20-15 = 2.3999999999999986):
    # the convention is deterministic quantization, not pretty decimals
    import math

    want = math.floor((12.0 * 29.0 / 20.0 - 15.0) * 1e6) / 1e6
    assert r["h_q6"] == want == 2.399999
    assert r["h_tie_q6"] == want


def test_kruskal_wallis_tie_correction(spark):
    # a=[1,1], b=[2,2]: midranks 1.5,1.5,3.5,3.5 -> H=2.4;
    # tie3 = 2*(8-2) = 12, C = 1 - 12/60 = 0.8 -> H/C = 3.0
    from png_from_pdf_extracter_spark.functions.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "g string, v double",
    )
    r = kruskal_wallis(df, "v", "g", quantize=0).collect()[0]
    assert r["tie3"] == 12
    import math

    h = 12.0 * 29.0 / 20.0 - 15.0
    assert r["h_q6"] == math.floor(h * 1e6) / 1e6
    assert r["h_tie_q6"] == math.floor(h / (1.0 - 12.0 / 60.0) * 1e6) / 1e6


def test_kruskal_wallis_degenerate_all_equal(spark):
    # every value identical: the tie term eats the whole denominator
    from png_from_pdf_extracter_spark.functions.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 5.0)], "g string, v double"
    )
    r = kruskal_wallis(df, "v", "g", quantize=0).collect()[0]
    assert r["h_tie_q6"] is None


def test_kruskal_wallis_matches_two_group_mann_whitney_family(spark):
    # k=2 KW is the square of the normalized MW statistic family —
    # spot-check against a scipy-verified constant on a fixed sample
    from png_from_pdf_extracter_spark.functions.stats import kruskal_wallis

    rows = [("a", float(v)) for v in (1, 3, 5, 7, 9)] + [
        ("b", float(v)) for v in (2, 4, 6, 8, 10)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "v", "g", quantize=0).collect()[0]
    # R_a=25, R_b=30 over ranks 1..10: H = 12/110*(125+180) - 33
    # = 0.27272... (scipy.stats.kruskal agrees); mirror the float ops
    import math

    h = 12.0 * (125.0 + 180.0) / (10.0 * 11.0) - 33.0
    assert r["h_q6"] == math.floor(h * 1e6) / 1e6
    assert abs(r["h_q6"] - 0.272727) < 2e-6


# ---- mann_kendall ----


def test_mann_kendall_strictly_increasing(spark):
    # v = 1..4 over x = 1..4: S = 6, var18 = 4*3*13 = 156,
    # z = (6-1)/sqrt(156/18) = 1.698415...
    from png_from_pdf_extracter_spark.functions.stats import mann_kendall

    df = spark.createDataFrame(
        [("u", i, float(i)) for i in range(1, 5)],
        "g string, x long, v double",
    )
    r = mann_kendall(df, ("g",), "x", "v", quantize=0).collect()[0]
    assert (r["n"], r["s_stat"], r["var18"]) == (4, 6, 156)
    import math

    expect = math.floor((5.0 / math.sqrt(156.0 / 18.0)) * 1e6) / 1e6
    assert r["z_q6"] == expect


def test_mann_kendall_ties_and_sign(spark):
    # v=[1,1,2,2]: S=4, tie term 36, var18=120; decreasing mirror
    # flips the sign exactly
    from png_from_pdf_extracter_spark.functions.stats import mann_kendall

    up = spark.createDataFrame(
        [("u", 1, 1.0), ("u", 2, 1.0), ("u", 3, 2.0), ("u", 4, 2.0)],
        "g string, x long, v double",
    )
    r = mann_kendall(up, ("g",), "x", "v", quantize=0).collect()[0]
    assert (r["s_stat"], r["var18"]) == (4, 120)
    down = spark.createDataFrame(
        [("u", 1, 2.0), ("u", 2, 2.0), ("u", 3, 1.0), ("u", 4, 1.0)],
        "g string, x long, v double",
    )
    r2 = mann_kendall(down, ("g",), "x", "v", quantize=0).collect()[0]
    assert r2["s_stat"] == -4 and r2["var18"] == 120
    assert r2["z_q6"] is not None and r["z_q6"] is not None


def test_mann_kendall_constant_series_zero_variance_of_sign(spark):
    # all values equal: S=0 and the tie term removes ALL variance ->
    # z is null, not a division blowup
    from png_from_pdf_extracter_spark.functions.stats import mann_kendall

    df = spark.createDataFrame(
        [("u", i, 7.0) for i in range(1, 5)],
        "g string, x long, v double",
    )
    r = mann_kendall(df, ("g",), "x", "v", quantize=0).collect()[0]
    assert r["s_stat"] == 0 and r["var18"] == 0 and r["z_q6"] is None


# ---- cusum_drift ----


def test_cusum_prefix_form_equals_recursion(spark):
    # hand recursion for [5,5,9,9,2] target 5: S = [0,0,4,8,5]
    from png_from_pdf_extracter_spark.functions.stats import cusum_drift

    df = spark.createDataFrame(
        [("u", i, float(v)) for i, v in enumerate([5, 5, 9, 9, 2], 1)],
        "g string, t long, v double",
    )
    out = cusum_drift(
        df, ("g",), ("t",), "v", target_q=5, quantize=0, threshold_q=6
    ).orderBy("idx").collect()
    assert [r["cusum_q"] for r in out] == [0, 0, 4, 8, 5]
    assert [r["alarm"] for r in out] == [False, False, False, True, False]


def test_cusum_negative_start_clamps_at_zero(spark):
    # [2,9] target 5: recursion S1=max(0,-3)=0, S2=max(0,0+4)=4
    from png_from_pdf_extracter_spark.functions.stats import cusum_drift

    df = spark.createDataFrame(
        [("u", 1, 2.0), ("u", 2, 9.0)], "g string, t long, v double"
    )
    out = cusum_drift(
        df, ("g",), ("t",), "v", target_q=5, quantize=0
    ).orderBy("idx").collect()
    assert [r["cusum_q"] for r in out] == [0, 4]
    assert "alarm" not in out[0].asDict()


def test_cusum_matches_recursion_on_random_walk(spark):
    # brute-force the recursion on a deterministic pseudo-random series
    from png_from_pdf_extracter_spark.functions.stats import cusum_drift

    vals = [((i * 37 + 11) % 13) - 6 for i in range(40)]  # in [-6, 6]
    df = spark.createDataFrame(
        [("u", i, float(v)) for i, v in enumerate(vals, 1)],
        "g string, t long, v double",
    )
    out = cusum_drift(
        df, ("g",), ("t",), "v", target_q=0, slack_q=1, quantize=0
    ).orderBy("idx").collect()
    s, want = 0, []
    for v in vals:
        s = max(0, s + v - 1)
        want.append(s)
    assert [r["cusum_q"] for r in out] == want


# ---- bh_fdr ----


def test_bh_fdr_textbook_battery(spark):
    # p=[.01,.02,.03,.5], m=4, alpha=.05: thresholds k/m*alpha are
    # .0125/.025/.0375/.05 -> k*=3, reject the three smallest
    from png_from_pdf_extracter_spark.functions.stats import bh_fdr

    df = spark.createDataFrame(
        [(0.01,), (0.02,), (0.03,), (0.5,)], "p double"
    )
    out = bh_fdr(df, "p").orderBy("p_q").collect()
    assert [r["reject"] for r in out] == [True, True, True, False]
    assert [r["k_le"] for r in out] == [1, 2, 3, 4]
    assert all(r["m"] == 4 for r in out)


def test_bh_fdr_ties_share_the_largest_rank(spark):
    # four identical p=.04: the BH convention uses the LARGEST tied
    # rank, so .04 <= (4/4)*.05 and ALL are rejected (a row_number
    # formulation would wrongly reject none at rank 1)
    from png_from_pdf_extracter_spark.functions.stats import bh_fdr

    df = spark.createDataFrame([(0.04,)] * 4, "p double")
    out = bh_fdr(df, "p").collect()
    assert all(r["reject"] for r in out)
    assert all(r["k_le"] == 4 for r in out)


def test_bh_fdr_nothing_clears_and_grouped_batteries(spark):
    from png_from_pdf_extracter_spark.functions.stats import bh_fdr

    df = spark.createDataFrame(
        [("a", 0.9), ("a", 0.8), ("b", 0.001), ("b", 0.9)],
        "g string, p double",
    )
    out = {
        (r["g"], r["p_q"]): r["reject"]
        for r in bh_fdr(df, "p", group_cols=("g",)).collect()
    }
    # group a: nothing rejected; group b: only the tiny p
    assert out[("a", 900000)] is False and out[("a", 800000)] is False
    assert out[("b", 1000)] is True and out[("b", 900000)] is False


# ---- winsorize ----


def test_winsorize_clamps_tails_exact_quantiles(spark):
    # values 1..10, [20%, 80%] band: lo=2 (cum 2 reaches 10*0.2),
    # hi=8 (cum 8 reaches 10*0.8); 1 clamps up, 9 and 10 clamp down
    from png_from_pdf_extracter_spark.functions.stats import winsorize

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 11)], "v double"
    )
    out = winsorize(
        df, "v", lo_num=20, lo_den=100, hi_num=80, hi_den=100, quantize=0
    ).orderBy("v_q").collect()
    assert [r["v_wins"] for r in out] == [2, 2, 3, 4, 5, 6, 7, 8, 8, 8]
    assert [r["clamped"] for r in out] == (
        [True] + [False] * 7 + [True, True]
    )


def test_winsorize_per_group_thresholds_independent(spark):
    from png_from_pdf_extracter_spark.functions.stats import winsorize

    rows = [("a", float(v)) for v in (1, 2, 3, 100)] + [
        ("b", float(v)) for v in (10, 20, 30, 40)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["g"], r["v_q"]): (r["v_wins"], r["clamped"])
        for r in winsorize(
            df, "v", ("g",), lo_num=25, lo_den=100,
            hi_num=75, hi_den=100, quantize=0,
        ).collect()
    }
    # group a: lo=1 (cum 1 >= 1), hi=3 (cum 3 >= 3); 100 clamps to 3
    assert out[("a", 100)] == (3, True)
    assert out[("a", 2)] == (2, False)
    # group b: lo=10, hi=30; 40 clamps to 30
    assert out[("b", 40)] == (30, True)
    assert out[("b", 20)] == (20, False)


# ---- keyness_g2 (functions/lm.py) ----


def test_keyness_g2_closed_form_and_direction(spark):
    # focus "x x y" vs reference "x y y y": for x, a=2 b=1 Na=3 Nb=4,
    # G2 = 2*(2*ln(2/(3*3/7)) + 1*ln(1/(4*3/7)))
    import math

    from png_from_pdf_extracter_spark.functions.lm import keyness_g2

    df = spark.createDataFrame(
        [("A", "x x y"), ("B", "x y y y")], "cls string, text string"
    )
    out = {
        r["word"]: r
        for r in keyness_g2(
            df, "cls", "A", min_count=1, top_k=10
        ).collect()
    }
    rx = out["x"]
    assert (rx["a"], rx["b"]) == (2, 1)
    g2 = 2.0 * (
        2.0 * math.log(2.0 / (3.0 * 3.0 / 7.0))
        + 1.0 * math.log(1.0 / (4.0 * 3.0 / 7.0))
    )
    assert rx["g2_q"] == math.floor(g2 * 10000) / 10000
    assert rx["direction"] == 1  # over-represented in focus
    assert out["y"]["direction"] == -1


def test_keyness_g2_zero_cell_contributes_zero(spark):
    # 'z' appears only in the focus corpus: the b*ln(b/Eb) term is the
    # x*ln(x) limit 0, never a NaN/-inf
    import math

    from png_from_pdf_extracter_spark.functions.lm import keyness_g2

    df = spark.createDataFrame(
        [("A", "z z z"), ("B", "w w w")], "cls string, text string"
    )
    out = {
        r["word"]: r
        for r in keyness_g2(df, "cls", "A", min_count=1).collect()
    }
    rz = out["z"]
    assert rz["b"] == 0 and rz["direction"] == 1
    g2 = 2.0 * (3.0 * math.log(3.0 / (3.0 * 3.0 / 6.0)))
    assert rz["g2_q"] == math.floor(g2 * 10000) / 10000
    assert math.isfinite(rz["g2_q"])


def test_keyness_g2_equal_share_scores_zero(spark):
    # identical distribution in both corpora: G2 = 0, direction 0
    from png_from_pdf_extracter_spark.functions.lm import keyness_g2

    df = spark.createDataFrame(
        [("A", "x y"), ("B", "x y")], "cls string, text string"
    )
    for r in keyness_g2(df, "cls", "A", min_count=1).collect():
        assert r["g2_q"] == 0.0 and r["direction"] == 0


# ---- cusum associative lift (batch state + fold) ----


def test_cusum_fold_states_equals_batch_for_every_split(spark):
    """The streamability identity: for EVERY way of cutting the series
    into ordered segments, folding per-segment (t_sum, g_max) states
    must land exactly on the batch recursion's final value."""
    from png_from_pdf_extracter_spark.functions.stats import (
        cusum_batch_state,
        cusum_drift,
        cusum_fold_states,
    )

    vals = [((i * 53 + 7) % 17) - 8 for i in range(24)]  # in [-8, 8]
    rows = [("u", i, float(v)) for i, v in enumerate(vals, 1)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    want = (
        cusum_drift(df, ("g",), ("t",), "v", target_q=0, quantize=0)
        .orderBy(F.desc("idx"))
        .first()["cusum_q"]
    )
    for cuts in ([8], [1], [23], [5, 9], [3, 11, 17]):
        bounds = [0] + cuts + [len(rows)]
        states = []
        for b, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            seg = spark.createDataFrame(
                rows[lo:hi], "g string, t long, v double"
            )
            states.append(
                cusum_batch_state(
                    seg, ("g",), ("t",), "v", target_q=0, quantize=0
                ).withColumn("batch_id", F.lit(b))
            )
        st = states[0]
        for s in states[1:]:
            st = st.unionByName(s)
        folded = (
            cusum_fold_states(st, ("g",))
            .orderBy(F.desc("batch_id"))
            .first()["cusum_q"]
        )
        assert folded == want, (cuts, folded, want)


def test_cusum_batch_state_single_segment_is_whole_answer(spark):
    # one segment: fold == the state's own max(T, G) == batch answer
    from png_from_pdf_extracter_spark.functions.stats import (
        cusum_batch_state,
        cusum_drift,
        cusum_fold_states,
    )

    rows = [("u", i, float(v)) for i, v in enumerate([5, 1, 9, 2], 1)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    st = cusum_batch_state(
        df, ("g",), ("t",), "v", target_q=3, quantize=0
    ).withColumn("batch_id", F.lit(0))
    folded = cusum_fold_states(st, ("g",), threshold_q=5).collect()[0]
    want = (
        cusum_drift(df, ("g",), ("t",), "v", target_q=3, quantize=0)
        .orderBy(F.desc("idx"))
        .first()["cusum_q"]
    )
    assert folded["cusum_q"] == want
    assert folded["alarm"] == (want > 5)


# ---- one-way ANOVA / Brown-Forsythe / Cramér's V / McNemar ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    anova_oneway,
    cramers_v,
    levene_bf,
)
from png_from_pdf_extracter_spark.functions.evalmetrics import (  # noqa: E402
    mcnemar_test,
)


def test_anova_matches_numpy(spark):
    import numpy as np

    groups = {
        "a": [1.0, 2.0, 3.0, 4.0, 5.0],
        "b": [2.5, 3.5, 4.5, 5.5],
        "c": [10.0, 11.0, 12.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "v", "g", quantize=2).collect()[0]
    # numpy reference on the quantized values
    xs = {g: np.array([round(v * 100) for v in vs]) for g, vs in groups.items()}
    allv = np.concatenate(list(xs.values()))
    gm = allv.mean()
    ssb = sum(len(v) * (v.mean() - gm) ** 2 for v in xs.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in xs.values())
    k, n = len(xs), len(allv)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["n"] == n and r["k"] == k
    assert abs(r["f_q6"] - f_ref) < 1e-5
    assert r["ssb_m6"] == int(np.floor(ssb / 1e6))
    assert r["ssw_m6"] == int(np.floor(ssw / 1e6))


def test_anova_equal_means_f_near_zero(spark):
    rows = [("a", v) for v in (1.0, 2.0, 3.0)] + [
        ("b", v) for v in (1.0, 2.0, 3.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "v", "g").collect()[0]
    assert r["f_q6"] == 0.0  # identical group sums: SSB exactly 0


def test_levene_matches_numpy(spark):
    import numpy as np

    groups = {
        "a": [1.0, 2.0, 3.0, 4.0, 100.0],  # fat spread
        "b": [5.0, 5.1, 5.2, 5.3],
        "c": [7.0, 7.5, 8.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_bf(df, "v", "g", quantize=2).collect()[0]
    # Brown-Forsythe with LOWER+UPPER median (doubled-median convention)
    zs = []
    for vs in groups.values():
        x = np.sort(np.array([round(v * 100) for v in vs]))
        n = len(x)
        med2 = x[(n + 1) // 2 - 1] + x[n // 2]
        zs.append(np.abs(2 * x - med2))
    allz = np.concatenate(zs)
    n, k = len(allz), len(zs)
    zbar = allz.mean()
    num = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
    den = sum(((z - z.mean()) ** 2).sum() for z in zs)
    w_ref = (n - k) / (k - 1) * num / den
    assert r["n"] == n and r["k"] == k
    assert abs(r["w_q6"] - w_ref) < 1e-5


def test_levene_identical_spreads_w_zero(spark):
    # same shape shifted: identical |deviation| multisets per group
    rows = [("a", v) for v in (1.0, 2.0, 3.0)] + [
        ("b", v + 50) for v in (1.0, 2.0, 3.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_bf(df, "v", "g").collect()[0]
    assert r["w_q6"] == 0.0


def test_cramers_v_perfect_association(spark):
    # diagonal table: a fully determines b -> V == 1
    rows = [("x", 1)] * 5 + [("y", 2)] * 7 + [("z", 3)] * 3
    df = spark.createDataFrame(rows, "a string, b int")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["n"] == 15 and r["r"] == 3 and r["c"] == 3
    assert abs(r["v_q6"] - 1.0) < 1e-5


def test_cramers_v_independent_near_zero(spark):
    # perfectly balanced 2x2: chi2 == 0 -> V == 0
    rows = [("x", 1), ("x", 2), ("y", 1), ("y", 2)] * 4
    df = spark.createDataFrame(rows, "a string, b int")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["chi2_q6"] == 0.0 and r["v_q6"] == 0.0


def test_cramers_v_degenerate_single_column_null(spark):
    rows = [("x", 1), ("y", 1), ("z", 1)]
    df = spark.createDataFrame(rows, "a string, b int")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["v_q6"] is None  # min(r,c)=1: V undefined


def test_mcnemar_closed_form(spark):
    # b=3 (A right, B wrong), c=1 -> (|3-1|-1)^2/4 = 0.25
    rows = (
        [(True, True, False)] * 3
        + [(True, False, True)] * 1
        + [(True, True, True)] * 6
    )
    df = spark.createDataFrame(rows, "label boolean, pa boolean, pb boolean")
    r = mcnemar_test(df, "label", "pa", "pb").collect()[0]
    assert (r["b"], r["c"]) == (3, 1)
    assert abs(r["mcnemar_q6"] - 0.25) < 1e-9
    assert r["acc_a_ppm"] == 900000 and r["acc_b_ppm"] == 700000


def test_mcnemar_no_discordant_null(spark):
    rows = [(True, True, True)] * 4
    df = spark.createDataFrame(rows, "label boolean, pa boolean, pb boolean")
    r = mcnemar_test(df, "label", "pa", "pb").collect()[0]
    assert r["mcnemar_q6"] is None and r["b"] == 0 and r["c"] == 0


# ---- Kendall tau-b / difference-in-differences ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    did_estimate,
    kendall_tau_b,
)


def _tau_b_ref(xs, ys):
    import math

    n = len(xs)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xs[j] > xs[i]) - (xs[j] < xs[i])
            dy = (ys[j] > ys[i]) - (ys[j] < ys[i])
            s += dx * dy
    m0 = n * (n - 1)
    m1 = sum(t * (t - 1) for t in __import__("collections").Counter(xs).values())
    m2 = sum(t * (t - 1) for t in __import__("collections").Counter(ys).values())
    return 2.0 * s / math.sqrt((m0 - m1) * (m0 - m2))


def test_kendall_tau_brute_force_with_ties(spark):
    xs = [1, 2, 2, 3, 5, 5, 7, 8]
    ys = [2, 1, 4, 4, 6, 5, 9, 9]
    rows = [("g", i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(rows, "g string, id long, x double, y double")
    r = kendall_tau_b(df, ("g",), "x", "y", "id", quantize=0).collect()[0]
    ref = _tau_b_ref(xs, ys)
    assert abs(r["tau_q6"] - ref) < 1e-5
    assert r["n"] == 8 and r["m0"] == 56


def test_kendall_tau_perfect_and_inverse(spark):
    rows = [("a", i, float(i), float(i)) for i in range(6)] + [
        ("b", i, float(i), float(-i)) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "g string, id long, x double, y double")
    out = {r["g"]: r for r in kendall_tau_b(df, ("g",), "x", "y", "id").collect()}
    assert out["a"]["tau_q6"] == 1.0
    assert out["b"]["tau_q6"] == -1.0


def test_kendall_tau_all_ties_null(spark):
    rows = [("g", i, 5.0, float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, id long, x double, y double")
    r = kendall_tau_b(df, ("g",), "x", "y", "id").collect()[0]
    assert r["tau_q6"] is None  # x margin fully tied: denominator zero


def test_did_closed_form(spark):
    # treated: 10 -> 20 (delta 10); control: 5 -> 8 (delta 3); DiD = 7
    rows = (
        [(10.0, True, False)] * 3
        + [(20.0, True, True)] * 2
        + [(5.0, False, False)] * 4
        + [(8.0, False, True)] * 5
    )
    df = spark.createDataFrame(rows, "y double, t boolean, p boolean")
    r = did_estimate(df, "y", "t", "p").collect()[0]
    assert (r["n_tp"], r["n_tq"], r["n_cp"], r["n_cq"]) == (2, 3, 5, 4)
    assert abs(r["did_q6"] - 7.0) < 1e-9


def test_did_empty_cell_null(spark):
    rows = [(1.0, True, True), (2.0, False, True), (3.0, False, False)]
    df = spark.createDataFrame(rows, "y double, t boolean, p boolean")
    r = did_estimate(df, "y", "t", "p").collect()[0]
    assert r["did_q6"] is None  # no treated-pre cell


# ---- Cliff's delta / Cochran's Q / Friedman ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    cliffs_delta,
    cochran_q,
    friedman_test,
)


def _delta_ref(a, b):
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    return (gt - lt) / (len(a) * len(b))


def test_cliffs_delta_brute_force(spark):
    a = [1.0, 2.0, 2.0, 5.0, 7.0]
    b = [2.0, 3.0, 3.0, 4.0]
    rows = [(x, "a") for x in a] + [(x, "b") for x in b]
    df = spark.createDataFrame(rows, "v double, g string")
    r = cliffs_delta(df, "v", "g", "a", "b", quantize=0).collect()[0]
    ref = _delta_ref(a, b)
    assert abs(r["delta_q6"] - ref) < 1e-5
    assert r["delta_num"] == round(ref * len(a) * len(b))


def test_cliffs_delta_extremes_and_bands(spark):
    rows = [(float(i), "a") for i in range(10, 15)] + [
        (float(i), "b") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
    assert r["delta_q6"] == 1.0 and r["magnitude"] == "large"
    same = spark.createDataFrame(
        [(1.0, "a"), (1.0, "b")] * 3, "v double, g string"
    )
    r2 = cliffs_delta(same, "v", "g", "a", "b").collect()[0]
    assert r2["delta_q6"] == 0.0 and r2["magnitude"] == "negligible"


def test_cochran_q_textbook(spark):
    # Conover's 3-rater example shape: hand-computed reference
    grid = [
        (1, 1, 1), (1, 1, 1), (0, 1, 0), (1, 1, 0), (0, 0, 0),
        (1, 1, 1), (1, 1, 1), (0, 1, 0), (1, 0, 0), (0, 0, 0),
        (1, 1, 1), (1, 1, 1),
    ]
    rows = []
    for i, js in enumerate(grid):
        for j, s in enumerate(js):
            rows.append((i, f"r{j}", s))
    df = spark.createDataFrame(rows, "item long, rater string, s long")
    r = cochran_q(df, "item", "rater", "s").collect()[0]
    k = 3
    T = [sum(g[j] for g in grid) for j in range(3)]
    R = [sum(g) for g in grid]
    num = (k - 1) * (k * sum(t * t for t in T) - sum(T) ** 2)
    den = k * sum(R) - sum(r2 * r2 for r2 in R)
    import math

    assert abs(r["q_q6"] - math.floor(num / den * 1e6) / 1e6) < 1e-9
    assert r["k"] == 3 and r["n_items"] == len(grid)


def test_cochran_q_unanimous_null(spark):
    rows = [(i, f"r{j}", 1) for i in range(4) for j in range(3)]
    df = spark.createDataFrame(rows, "item long, rater string, s long")
    assert cochran_q(df, "item", "rater", "s").collect()[0]["q_q6"] is None


def _friedman_ref(blocks):
    # blocks: list of per-subject value lists (complete design)
    import math

    k = len(blocks[0])
    n = len(blocks)
    a4 = 0
    r2_sums = [0] * k
    for vals in blocks:
        order = sorted(vals)
        for j, v in enumerate(vals):
            rank_min = 1 + sum(1 for w in vals if w < v)
            ties = sum(1 for w in vals if w == v)
            r2 = 2 * rank_min + ties - 1
            r2_sums[j] += r2
            a4 += r2 * r2
    c4 = n * k * (k + 1) ** 2
    s4 = sum((r2s - n * (k + 1)) ** 2 for r2s in r2_sums)
    if a4 == c4:
        return None
    return math.floor((k - 1) * s4 / (a4 - c4) * 1e6) / 1e6


def test_friedman_brute_force_with_ties(spark):
    blocks = [
        [3.0, 1.0, 2.0],
        [2.0, 2.0, 1.0],
        [3.0, 1.0, 1.0],
        [2.0, 1.0, 3.0],
        [3.0, 2.0, 1.0],
    ]
    rows = [
        (i, f"t{j}", v)
        for i, vals in enumerate(blocks)
        for j, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "subj long, trt string, v double")
    r = friedman_test(df, "subj", "trt", "v", quantize=0).collect()[0]
    assert r["q_q6"] == _friedman_ref(blocks)
    assert r["n_subjects"] == 5 and r["k"] == 3


def test_friedman_all_tied_null(spark):
    rows = [(i, f"t{j}", 1.0) for i in range(3) for j in range(3)]
    df = spark.createDataFrame(rows, "subj long, trt string, v double")
    assert (
        friedman_test(df, "subj", "trt", "v").collect()[0]["q_q6"] is None
    )


# ---- Hodges-Lehmann ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    hodges_lehmann,
)


def _hl_ref(xs):
    import statistics

    walsh = [
        (xs[i] + xs[j]) / 2
        for i in range(len(xs))
        for j in range(i, len(xs))
    ]
    return statistics.median(walsh)


def test_hodges_lehmann_brute_force(spark):
    xs = [1.0, 2.0, 4.0, 7.0, 11.0]
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    r = hodges_lehmann(df, "v", quantize=0).collect()[0]
    assert r["n"] == 5 and r["n_walsh"] == 15
    assert abs(r["hl_q6"] - _hl_ref(xs)) < 1e-6


def test_hodges_lehmann_with_ties_and_groups(spark):
    xs_a = [1.0, 1.0, 2.0, 3.0]
    xs_b = [10.0, 20.0]
    rows = [("a", x) for x in xs_a] + [("b", x) for x in xs_b]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r
        for r in hodges_lehmann(df, "v", ("g",), quantize=0).collect()
    }
    assert out["a"]["n_walsh"] == 10  # C(4,2) + 4 diagonal
    assert abs(out["a"]["hl_q6"] - _hl_ref(xs_a)) < 1e-6
    assert abs(out["b"]["hl_q6"] - _hl_ref(xs_b)) < 1e-6


def test_hodges_lehmann_outlier_robust(spark):
    xs = [10.0, 11.0, 12.0, 13.0, 14.0, 1e6]
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    r = hodges_lehmann(df, "v", quantize=0).collect()[0]
    assert 10.0 <= r["hl_q6"] <= 15.0  # one wild point cannot drag it


# ---- Jonckheere-Terpstra / Page's L ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    jonckheere_terpstra,
    page_trend_test,
)


def _jt_ref(groups):
    # groups: dict ordered-key -> values; doubled J with half-credit ties
    keys = sorted(groups)
    j2 = 0
    for a in range(len(keys)):
        for b in range(a + 1, len(keys)):
            for x in groups[keys[a]]:
                for y in groups[keys[b]]:
                    j2 += 2 if y > x else (1 if y == x else 0)
    return j2


def test_jonckheere_brute_force_with_ties(spark):
    groups = {
        "a": [1.0, 2.0, 2.0],
        "b": [2.0, 3.0],
        "c": [3.0, 4.0, 5.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = jonckheere_terpstra(df, "v", "g", quantize=0).collect()[0]
    assert r["j2"] == _jt_ref(groups)
    n = 8
    sn2 = 9 + 4 + 9
    assert r["mean4"] == n * n - sn2
    assert r["n"] == n and r["k"] == 3


def test_jonckheere_perfect_trend_z_positive(spark):
    groups = {"a": [1.0, 2.0], "b": [3.0, 4.0], "c": [5.0, 6.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = jonckheere_terpstra(df, "v", "g").collect()[0]
    assert r["j2"] == 2 * 12  # every later-group value beats every earlier
    assert r["z_q6"] > 2.0


def test_page_trend_perfect_order(spark):
    # values rise with treatment for every subject -> R_j = n * rank
    rows = [
        (s, f"t{j}", float(j)) for s in range(4) for j in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "subj long, trt string, v double")
    r = page_trend_test(df, "subj", "trt", "v", quantize=0).collect()[0]
    n, k = 4, 3
    l2 = sum((j) * 2 * j * n for j in range(1, 4))  # ord j, rank j
    assert r["l2"] == l2
    e4 = n * k * (k + 1) ** 2
    v144 = n * k * k * (k + 1) * (k * k - 1)
    import math

    assert r["z_q6"] == math.floor(
        3.0 * (2 * l2 - e4) / math.sqrt(v144) * 1e6
    ) / 1e6
    assert r["z_q6"] > 2.0


def test_page_trend_flat_is_zero_z(spark):
    # within-subject ranks identical across treatments in expectation:
    # reversed order for half the subjects cancels -> z near 0
    rows = []
    for s in range(4):
        vals = [1.0, 2.0, 3.0] if s % 2 == 0 else [3.0, 2.0, 1.0]
        for j, v in enumerate(vals):
            rows.append((s, f"t{j}", v))
    df = spark.createDataFrame(rows, "subj long, trt string, v double")
    r = page_trend_test(df, "subj", "trt", "v", quantize=0).collect()[0]
    assert abs(r["z_q6"]) < 1e-6


# ---- runs test / Durbin-Watson ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    durbin_watson,
    runs_test,
)


def test_runs_test_alternating_vs_streaky(spark):
    import math

    # perfectly alternating around the median -> max runs, z > 0
    alt = [(i, float(i % 2)) for i in range(12)]
    df = spark.createDataFrame(alt, "o long, v double")
    r = runs_test(df, "v", "o", quantize=0).collect()[0]
    assert r["n1"] == 6 and r["n2"] == 6 and r["runs"] == 12
    n1 = n2 = 6
    n = 12
    mean_r = 1 + 2 * n1 * n2 / n
    var_r = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    assert r["z_q6"] == math.floor(
        (12 - mean_r) / math.sqrt(var_r) * 1e6
    ) / 1e6
    # fully streaky: 6 lows then 6 highs -> 2 runs, z < 0
    streak = [(i, 0.0 if i < 6 else 10.0) for i in range(12)]
    df2 = spark.createDataFrame(streak, "o long, v double")
    r2 = runs_test(df2, "v", "o", quantize=0).collect()[0]
    assert r2["runs"] == 2 and r2["z_q6"] < -2.0


def test_runs_test_median_values_excluded(spark):
    # odd n: exact-median value sits out; 2-1-2 remaining
    rows = [(0, 1.0), (1, 5.0), (2, 9.0), (3, 5.0), (4, 1.0)]
    df = spark.createDataFrame(rows, "o long, v double")
    r = runs_test(df, "v", "o", quantize=0).collect()[0]
    assert r["n1"] + r["n2"] == 3  # two 5.0s (the median) excluded


def test_runs_test_one_sided_null(spark):
    rows = [(i, 1.0 if i == 0 else 9.0) for i in range(5)]
    df = spark.createDataFrame(rows, "o long, v double")
    r = runs_test(df, "v", "o", quantize=0).collect()[0]
    # median side has everything above/below unbalanced but both
    # present; construct a truly one-sided case instead:
    df2 = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 1.0)], "o long, v double"
    )
    r2 = runs_test(df2, "v", "o", quantize=0).collect()[0]
    assert r2["z_q6"] is None


def test_durbin_watson_reference(spark):
    xs = [3.0, 5.0, 2.0, 8.0, 7.0, 1.0]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "o long, v double"
    )
    r = durbin_watson(df, "v", "o", quantize=0).collect()[0]
    import math

    m = sum(xs) / len(xs)
    e = [x - m for x in xs]
    ref = sum(
        (e[t] - e[t - 1]) ** 2 for t in range(1, len(e))
    ) / sum(x * x for x in e)
    assert abs(r["dw_q6"] - math.floor(ref * 1e6) / 1e6) < 1e-9


def test_durbin_watson_constant_null_and_alternating(spark):
    const = spark.createDataFrame(
        [(i, 4.0) for i in range(5)], "o long, v double"
    )
    assert durbin_watson(const, "v", "o").collect()[0]["dw_q6"] is None
    alt = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(50)], "o long, v double"
    )
    r = durbin_watson(alt, "v", "o", quantize=0).collect()[0]
    assert r["dw_q6"] > 3.5  # strong negative lag-1 autocorrelation


# ---- Mood's median test ----

from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    mood_median_test,
)


def test_mood_median_closed_form(spark):
    import math

    # group a all below the grand median, group b all above
    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("b", float(v)) for v in (10, 11, 12, 13)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median_test(df, "v", "g", quantize=0).collect()[0]
    # grand median between 4 and 10: 4 below / 4 above, fully separated
    # -> chi2 = N = 8 for a 2x2 with perfect association
    assert r["n"] == 8 and r["k"] == 2
    assert abs(r["chi2_q6"] - 8.0) < 1e-6
    assert r["above_total"] == 4
    _ = math


def test_mood_median_identical_groups_zero(spark):
    rows = [(g, float(v)) for g in ("a", "b") for v in (1, 2, 9, 10)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median_test(df, "v", "g", quantize=0).collect()[0]
    assert r["chi2_q6"] == 0.0


def test_mood_median_excludes_exact_median_and_vacuous_null(spark):
    # odd value at the exact median is excluded from both sides
    rows = [("a", 1.0), ("a", 5.0), ("b", 5.0), ("b", 9.0), ("a", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median_test(df, "v", "g", quantize=0).collect()[0]
    assert r["n"] == 2  # three 5.0s (the median) excluded
    # ALL values at the median -> every row excluded -> empty result
    # (same zero-row output from the DuckDB oracle shape)
    const = spark.createDataFrame(
        [("a", 2.0), ("b", 2.0)], "g string, v double"
    )
    assert mood_median_test(const, "v", "g").collect() == []
    # one-sided margin (every surviving value above the median side
    # used by group b only) -> chi2 is vacuous -> null, row still out
    skew = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 9.0)],
        "g string, v double",
    )
    r2 = mood_median_test(skew, "v", "g", quantize=0).collect()[0]
    assert r2["chi2_q6"] is None


from png_from_pdf_extracter_spark.functions.stats import (  # noqa: E402
    nelson_aalen,
    log_rank_test,
)


def test_nelson_aalen_hand_computed(spark):
    # t=1: d=1 n=4 -> +0.25 ; t=2: censored only ; t=3: d=2 n=2 -> +1.0
    rows = [(1, 1), (2, 0), (3, 1), (3, 1)]
    df = spark.createDataFrame(rows, "dur long, e int")
    out = {
        r["duration"]: r for r in nelson_aalen(df, "dur", "e").collect()
    }
    assert out[1]["hazard_q"] == 0.25 and out[1]["n_at_risk"] == 4
    assert out[2]["hazard_q"] == 0.25 and out[2]["c_censored"] == 1
    assert out[3]["hazard_q"] == 1.25 and out[3]["n_at_risk"] == 2


def test_nelson_aalen_monotone_and_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randint(0, 12), rng.randint(0, 1)) for _ in range(200)]
    df = spark.createDataFrame(rows, "dur long, e int")
    got = sorted(
        nelson_aalen(df, "dur", "e").collect(),
        key=lambda r: r["duration"],
    )
    # python twin of the quantized construction
    from collections import Counter

    d = Counter(t for t, e in rows if e == 1)
    c = Counter(t for t, e in rows if e == 0)
    ts = sorted(set(d) | set(c))
    n = len(rows)
    cum = 0
    import math

    prev = -1.0
    for r in ts:
        cum += math.floor(d.get(r, 0) * 1e9 / n)
        row = [x for x in got if x["duration"] == r][0]
        expect = math.floor(cum / 1e3) / 1e6
        assert row["hazard_q"] == expect
        assert row["hazard_q"] >= prev  # cumulative hazard is monotone
        prev = row["hazard_q"]
        n -= d.get(r, 0) + c.get(r, 0)


def test_log_rank_identical_arms_zero(spark):
    # both arms share the same (duration, event) multiset -> at every
    # event time d_a == d/2 and n_a == n/2, so O == E exactly and the
    # quantized chi2 is exactly 0
    base = [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0)]
    rows = [(t, e, g) for g in (0, 1) for (t, e) in base]
    df = spark.createDataFrame(rows, "dur long, e int, arm int")
    r = log_rank_test(df, "dur", "e", "arm").collect()[0]
    assert r["n_a"] == 5 and r["n_b"] == 5
    assert r["chi2_q6"] == 0.0 and r["o_a"] == 3


def test_log_rank_separated_arms_and_brute_force(spark):
    import math
    import random

    rng = random.Random(11)
    rows = [
        (rng.randint(1, 8) + (0 if g == 0 else 6), rng.randint(0, 1), g)
        for g in (0, 1)
        for _ in range(60)
    ]
    df = spark.createDataFrame(rows, "dur long, e int, arm int")
    r = log_rank_test(df, "dur", "e", "arm").collect()[0]
    # python twin: hypergeometric E and V per event time
    from collections import Counter

    da = Counter(t for t, e, g in rows if g == 0 and e == 1)
    db = Counter(t for t, e, g in rows if g == 1 and e == 1)
    ca = Counter(t for t, e, g in rows if g == 0 and e == 0)
    cb = Counter(t for t, e, g in rows if g == 1 and e == 0)
    ts = sorted(set(da) | set(db) | set(ca) | set(cb))
    ra = sum(1 for _, _, g in rows if g == 0)
    rb = len(rows) - ra
    oa = sum(da.values())
    e9 = v9 = 0
    for t in ts:
        d = da.get(t, 0) + db.get(t, 0)
        n = ra + rb
        if d > 0 and n > 1:
            e9 += math.floor(d * ra / n * 1e9)
            v9 += math.floor(
                d * ra * rb * (n - d) / (n * n * (n - 1)) * 1e9
            )
        ra -= da.get(t, 0) + ca.get(t, 0)
        rb -= db.get(t, 0) + cb.get(t, 0)
    assert r["o_a"] == oa
    assert r["e_a_q6"] == math.floor(e9 / 1e3) / 1e6
    assert r["v_q6"] == math.floor(v9 / 1e3) / 1e6
    # arm 0 fails early, arm 1 late -> strong separation
    assert r["chi2_q6"] > 10.0


def test_log_rank_no_mixing_null(spark):
    # a single subject: V == 0 -> chi2 null (vacuous comparison)
    df = spark.createDataFrame([(1, 1, 0)], "dur long, e int, arm int")
    r = log_rank_test(df, "dur", "e", "arm").collect()[0]
    assert r["chi2_q6"] is None


def test_welch_identical_arms_zero(spark):
    from png_from_pdf_extracter_spark.functions.stats import welch_t_test

    base = [1.0, 2.0, 3.5, 4.25, 9.0]
    rows = [(v, g) for g in (0, 1) for v in base]
    df = spark.createDataFrame(rows, "v double, arm int")
    r = welch_t_test(df, "v", "arm", quantize=2).collect()[0]
    assert r["n_a"] == 5 and r["n_b"] == 5
    assert r["mean_a_q6"] == r["mean_b_q6"]
    assert r["t_q6"] == 0.0 and r["d_q6"] == 0.0


def test_welch_python_twin(spark):
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from png_from_pdf_extracter_spark.functions.stats import welch_t_test

    def q2(v):
        # Spark F.round on DoubleType = BigDecimal.valueOf (shortest
        # decimal repr, like Python repr) + HALF_UP — NOT banker's.
        return int(
            Decimal(repr(v * 100.0)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )

    rng = random.Random(23)
    rows = [(round(rng.uniform(0, 50), 3) + (0 if g == 0 else 7.5), g)
            for g in (0, 1) for _ in range(80)]
    df = spark.createDataFrame(rows, "v double, arm int")
    r = welch_t_test(df, "v", "arm", quantize=2).collect()[0]
    a = [q2(v) for v, g in rows if g == 0]
    b = [q2(v) for v, g in rows if g == 1]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = (sum(x * x for x in a) - ma * sum(a)) / (na - 1)
    vb = (sum(x * x for x in b) - mb * sum(b)) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dfree = se2 * se2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert r["t_q6"] == math.floor(t * 1e6) / 1e6
    assert r["df_q6"] == math.floor(dfree * 1e6) / 1e6
    # arm B is shifted +7.5 (~half an sd of U(0,50)) -> t clearly negative
    assert r["t_q6"] < -2.0
    # Welch df bounded by n_a + n_b - 2
    assert 1.0 <= r["df_q6"] <= na + nb - 2


def test_welch_degenerate_null(spark):
    from png_from_pdf_extracter_spark.functions.stats import welch_t_test

    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 1), (3.0, 1)], "v double, arm int"
    )
    r = welch_t_test(df, "v", "arm").collect()[0]
    assert r["t_q6"] is None and r["df_q6"] is None


def test_cochran_armitage_perfect_trend(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        cochran_armitage,
    )

    # rate rises 10% -> 90% across five doses
    rows = []
    for dose, rate in enumerate([0.1, 0.3, 0.5, 0.7, 0.9]):
        k = int(rate * 20)
        rows += [(dose, 1)] * k + [(dose, 0)] * (20 - k)
    df = spark.createDataFrame(rows, "dose long, e int")
    r = cochran_armitage(df, "dose", "e").collect()[0]
    assert r["n"] == 100 and r["k_doses"] == 5
    assert r["z_q6"] > 5.0 and r["chi2_q6"] > 25.0


def test_cochran_armitage_flat_rate_exact_zero(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        cochran_armitage,
    )

    # r_j proportional to n_j at every dose -> numerator is exactly 0
    rows = []
    for dose in range(4):
        rows += [(dose, 1)] * 5 + [(dose, 0)] * 15
    df = spark.createDataFrame(rows, "dose long, e int")
    r = cochran_armitage(df, "dose", "e").collect()[0]
    assert r["chi2_q6"] == 0.0 and r["z_q6"] == 0.0


def test_cochran_armitage_python_twin_and_degenerate(spark):
    import math
    import random

    from png_from_pdf_extracter_spark.functions.stats import (
        cochran_armitage,
    )

    rng = random.Random(7)
    rows = [
        (d, 1 if rng.random() < 0.2 + 0.1 * d else 0)
        for d in range(6)
        for _ in range(30)
    ]
    df = spark.createDataFrame(rows, "dose long, e int")
    r = cochran_armitage(df, "dose", "e").collect()[0]
    n = len(rows)
    rr = sum(e for _, e in rows)
    sxn = sum(d for d, _ in rows)
    sxr = sum(d for d, e in rows if e)
    sxx = sum(d * d for d, _ in rows)
    num = n * sxr - rr * sxn
    den = rr * (n - rr) * (n * sxx - sxn * sxn)
    chi2 = n * num * num / den
    assert r["chi2_q6"] == math.floor(chi2 * 1e6) / 1e6
    assert r["z_q6"] == math.floor(
        math.copysign(math.sqrt(chi2), num) * 1e6
    ) / 1e6
    # degenerate: single dose level -> null
    one = spark.createDataFrame([(2, 1), (2, 0)], "dose long, e int")
    assert cochran_armitage(one, "dose", "e").collect()[0]["chi2_q6"] is None
    # degenerate: zero events -> null
    zero = spark.createDataFrame([(1, 0), (2, 0)], "dose long, e int")
    assert cochran_armitage(zero, "dose", "e").collect()[0]["z_q6"] is None


def test_cvm_identical_arms_small(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        cramer_von_mises_2s,
    )

    base = [1.0, 2.0, 3.0, 4.0, 5.0]
    rows = [(v, g) for g in (0, 1) for v in base]
    df = spark.createDataFrame(rows, "v double, arm int")
    r = cramer_von_mises_2s(df, "v", "arm", quantize=2).collect()[0]
    assert r["n_a"] == 5 and r["n_b"] == 5
    # identical samples: F_n == G_m at every pooled point -> T == 0
    assert r["t_q6"] == 0.0


def test_cvm_python_twin(spark):
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from png_from_pdf_extracter_spark.functions.stats import (
        cramer_von_mises_2s,
    )

    def q2(v):
        return int(
            Decimal(repr(v * 100.0)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )

    rng = random.Random(7)
    rows = [(round(rng.uniform(0, 20), 2), 0) for _ in range(60)] + [
        (round(rng.uniform(5, 25), 2), 1) for _ in range(45)
    ]
    df = spark.createDataFrame(rows, "v double, arm int")
    r = cramer_von_mises_2s(df, "v", "arm", quantize=2).collect()[0]
    a = sorted(q2(v) for v, g in rows if g == 0)
    b = sorted(q2(v) for v, g in rows if g == 1)
    n, m = len(a), len(b)
    pooled = sorted(set(a) | set(b))
    u = 0
    for z in pooled:
        c = a.count(z) + b.count(z)
        ka = sum(1 for x in a if x <= z)
        kb = sum(1 for x in b if x <= z)
        u += c * (m * ka - n * kb) ** 2
    t = u / (n * m * (n + m) * (n + m))
    assert r["n_a"] == n and r["n_b"] == m
    assert r["t_q6"] == math.floor(t * 1e6) / 1e6
    # shifted arm -> clearly positive criterion
    assert r["t_q6"] > 0.05


def test_cvm_degenerate_one_arm(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        cramer_von_mises_2s,
    )

    df = spark.createDataFrame([(1.0, 0), (2.0, 0)], "v double, arm int")
    r = cramer_von_mises_2s(df, "v", "arm", quantize=2).collect()[0]
    assert r["n_b"] == 0 and r["t_q6"] is None


def test_tukey_textbook(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import tukey_hsd

    # three groups of 4; group c is shifted far from a and b
    data = {
        "a": [1.0, 2.0, 3.0, 4.0],
        "b": [1.5, 2.5, 3.5, 4.5],
        "c": [10.0, 11.0, 12.0, 13.0],
    }
    rows = [(v, g) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "v double, grp string")
    out = {
        (r["g_a"], r["g_b"]): r
        for r in tukey_hsd(df, "v", "grp", quantize=2).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    # python twin in quantized cents
    q = {g: [int(round(v * 100)) for v in vs] for g, vs in data.items()}
    means = {g: sum(vs) / len(vs) for g, vs in q.items()}
    ssw = sum(
        sum(x * x for x in vs) - (sum(vs) ** 2) / len(vs)
        for vs in q.values()
    )
    n_tot = sum(len(vs) for vs in q.values())
    msw = ssw / (n_tot - 3)
    for (ga, gb), r in out.items():
        diff = means[ga] - means[gb]
        se = math.sqrt(msw / 2.0 * (1.0 / 4 + 1.0 / 4))
        assert r["diff_q6"] == math.floor(diff / 100.0 * 1e6) / 1e6
        assert abs(r["q_q6"] - abs(diff) / se) < 1e-5
    # the shifted group dominates: q(a,c) >> q(a,b)
    assert out[("a", "c")]["q_q6"] > out[("a", "b")]["q_q6"] * 5


def test_tukey_unbalanced_kramer_and_degenerate(spark):
    from png_from_pdf_extracter_spark.functions.stats import tukey_hsd

    # unbalanced arms exercise the Tukey-Kramer 1/n_a + 1/n_b term
    rows = [(float(v), "x") for v in (1, 2, 3, 4, 5, 6)] + [
        (float(v), "y") for v in (4, 5)
    ]
    df = spark.createDataFrame(rows, "v double, grp string")
    r = tukey_hsd(df, "v", "grp", quantize=2).collect()
    assert len(r) == 1 and r[0]["n_a"] == 6 and r[0]["n_b"] == 2
    assert r[0]["q_q6"] is not None and r[0]["q_q6"] > 0
    # constant values -> MSW == 0 -> q null, means still emitted
    df2 = spark.createDataFrame(
        [(2.0, "x"), (2.0, "x"), (2.0, "y"), (2.0, "y")],
        "v double, grp string",
    )
    r2 = tukey_hsd(df2, "v", "grp", quantize=2).collect()[0]
    assert r2["q_q6"] is None and r2["diff_q6"] == 0.0


def test_energy_distance_identical_zero_and_shift(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        energy_distance_2s,
    )

    base = [1.0, 2.0, 3.0, 7.0]
    rows = [(v, g) for g in (0, 1) for v in base]
    df = spark.createDataFrame(rows, "v double, arm int")
    r = energy_distance_2s(df, "v", "arm", quantize=2).collect()[0]
    assert r["n_a"] == 4 and r["n_b"] == 4 and r["d2_q6"] == 0.0
    # disjoint shifted arms: D^2 -> 2*shift - spread terms, strictly > 0
    rows2 = [(v, 0) for v in base] + [(v + 100.0, 1) for v in base]
    df2 = spark.createDataFrame(rows2, "v double, arm int")
    r2 = energy_distance_2s(df2, "v", "arm", quantize=2).collect()[0]
    assert r2["d2_q6"] > 100.0


def test_energy_distance_python_twin(spark):
    import math
    import random

    import pytest
    from decimal import ROUND_HALF_UP, Decimal

    from png_from_pdf_extracter_spark.functions.stats import (
        energy_distance_2s,
    )

    def q2(v):
        return int(
            Decimal(repr(v * 100.0)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )

    rng = random.Random(11)
    rows = [(round(rng.uniform(0, 30), 2), 0) for _ in range(50)] + [
        (round(rng.uniform(10, 45), 2), 1) for _ in range(35)
    ]
    df = spark.createDataFrame(rows, "v double, arm int")
    r = energy_distance_2s(df, "v", "arm", quantize=2).collect()[0]
    a = [q2(v) for v, g in rows if g == 0]
    b = [q2(v) for v, g in rows if g == 1]
    n, m = len(a), len(b)
    exy = sum(abs(x - y) for x in a for y in b) / (n * m)
    exx = sum(abs(x - y) for x in a for y in a) / (n * n)
    eyy = sum(abs(x - y) for x in b for y in b) / (m * m)
    d2 = (2.0 * exy - exx - eyy) / 100.0
    # the sweep identity is exact in integers; only the final float
    # assembly differs in op order from the brute force, so compare to
    # 1e-9 rather than bit-equality, then pin the q6 floor loosely
    assert abs((2 * sum(abs(x - y) for x in a for y in b)) / (n * m)
               - 2.0 * exy) < 1e-9
    assert r["d2_q6"] == pytest.approx(math.floor(d2 * 1e6) / 1e6, abs=2e-6)
    assert r["d2_q6"] > 0


def test_energy_distance_one_arm_null(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        energy_distance_2s,
    )

    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "v double, arm int")
    r = energy_distance_2s(df, "v", "arm", quantize=2).collect()[0]
    assert r["d2_q6"] is None


def test_hill_tail_pareto_recovers_alpha(spark):
    import random

    from png_from_pdf_extracter_spark.functions.stats import (
        hill_tail_index,
    )

    # exact Pareto(alpha=2) quantiles: x_i = (1 - u_i)^(-1/2), u_i
    # uniform grid -> Hill over the top tail estimates ~2
    n = 4000
    vals = [(1.0 - (i + 0.5) / n) ** -0.5 * 100.0 for i in range(n)]
    rng = random.Random(5)
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = hill_tail_index(df, "v", k=200, quantize=2).collect()[0]
    assert r["n"] == n and r["k"] == 200
    assert 1.6 < r["alpha_q6"] < 2.4


def test_hill_tail_python_twin_with_ties(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import (
        hill_tail_index,
    )

    # heavy ties straddling the k boundary exercise the rank-capped
    # multiplicity logic
    vals = [50.0] * 3 + [40.0] * 4 + [30.0] * 6 + [20.0] * 10 + [10.0] * 20
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    k = 8
    r = hill_tail_index(df, "v", k=k, quantize=0).collect()[0]
    s = sorted(vals, reverse=True)
    topk = s[:k]
    xref = s[k]
    gap = sum(math.log(x) for x in topk) / k - math.log(xref)
    assert r["k"] == k and r["xref"] == xref
    assert r["alpha_q6"] == math.floor(1.0 / gap * 1e6) / 1e6


def test_hill_tail_degenerate_null(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        hill_tail_index,
    )

    df = spark.createDataFrame([(5.0,)] * 30, "v double")
    r = hill_tail_index(df, "v", k=10, quantize=0).collect()[0]
    assert r["alpha_q6"] is None


def test_cuped_python_twin_and_variance_reduction(spark):
    import math
    import random

    from png_from_pdf_extracter_spark.functions.stats import cuped_adjust

    rng = random.Random(17)
    rows = []
    for i in range(200):
        pre = rng.uniform(10, 50)
        arm = i % 2
        # post = pre signal + arm effect + noise -> strong correlation
        post = pre * 2.0 + (5.0 if arm == 1 else 0.0) + rng.uniform(-3, 3)
        rows.append((round(pre, 2), round(post, 2), arm))
    df = spark.createDataFrame(rows, "pre double, post double, arm int")
    r = cuped_adjust(df, "pre", "post", "arm", quantize=2).collect()[0]
    x = [int(round(p * 100)) for p, _, _ in rows]
    y = [int(round(q * 100)) for _, q, _ in rows]
    n = len(rows)
    sx, sy = sum(x), sum(y)
    cov = sum(a * b for a, b in zip(x, y)) - sx * sy / n
    varx = sum(a * a for a in x) - sx * sx / n
    vary = sum(b * b for b in y) - sy * sy / n
    theta = cov / varx
    assert abs(r["theta_q6"] - theta) < 1e-5
    assert r["rho2_q6"] > 0.9  # strong pre/post correlation by design
    # adjusted diff stays close to the planted +5 arm effect
    adj_diff = r["adj_b_q6"] - r["adj_a_q6"]
    assert 4.0 < adj_diff < 6.0
    assert r["mean_a_q6"] is not None and r["mean_b_q6"] is not None
    assert math.isfinite(adj_diff)


def test_cuped_zero_pre_variance_null(spark):
    from png_from_pdf_extracter_spark.functions.stats import cuped_adjust

    df = spark.createDataFrame(
        [(3.0, 1.0, 0), (3.0, 2.0, 1), (3.0, 4.0, 0), (3.0, 9.0, 1)],
        "pre double, post double, arm int",
    )
    r = cuped_adjust(df, "pre", "post", "arm", quantize=2).collect()[0]
    assert r["theta_q6"] is None and r["adj_a_q6"] is None
    assert r["mean_a_q6"] is not None


def test_wilson_textbook_and_edges(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import (
        wilson_interval,
    )

    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 0)] * 5
    df = spark.createDataFrame(rows, "g string, s int")
    out = {
        r["g"]: r
        for r in wilson_interval(df, "s", group_cols=("g",)).collect()
    }
    # python twin for group a: n=10, s=8
    n, s, z = 10, 8, 1.96
    p = s / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2.0 * n)) / denom
    half = z / denom * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    assert out["a"]["p_q6"] == 0.8
    assert out["a"]["lo_q6"] == math.floor(max(center - half, 0.0) * 1e6) / 1e6
    assert out["a"]["hi_q6"] == math.floor(min(center + half, 1.0) * 1e6) / 1e6
    # p_hat = 0 edge: Wald collapses to [0,0]; Wilson stays open
    assert out["b"]["p_q6"] == 0.0
    assert out["b"]["lo_q6"] == 0.0 and out["b"]["hi_q6"] > 0.3
    # interval brackets the point estimate
    for r in out.values():
        assert r["lo_q6"] <= r["p_q6"] <= r["hi_q6"]


def test_jackknife_python_twin(spark):
    import math
    import random

    from png_from_pdf_extracter_spark.functions.stats import (
        jackknife_group_se,
    )

    rng = random.Random(41)
    rows = []
    for g in range(8):
        mu = 10 + g * 3
        for _ in range(30):
            rows.append((round(rng.gauss(mu, 2), 2), f"g{g}"))
    df = spark.createDataFrame(rows, "v double, grp string")
    r = jackknife_group_se(df, "v", "grp", quantize=2).collect()[0]
    q = [(int(round(v * 100)), g) for v, g in rows]
    per = {}
    for v, g in q:
        n, s = per.get(g, (0, 0))
        per[g] = (n + 1, s + v)
    n_tot = sum(n for n, _ in per.values())
    s_tot = sum(s for _, s in per.values())
    thetas = [
        (s_tot - s) / (n_tot - n) for _, (n, s) in sorted(per.items())
    ]
    gg = len(thetas)
    var = (gg - 1) / gg * (
        sum(t * t for t in thetas) - sum(thetas) ** 2 / gg
    )
    assert r["g"] == 8 and r["n"] == n_tot
    assert abs(r["se_q6"] - math.sqrt(var) / 100.0) < 1e-5
    # between-group spread is large by design -> SE well above iid SE
    assert r["se_q6"] > 0.5


def test_jackknife_degenerate_single_group(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        jackknife_group_se,
    )

    df = spark.createDataFrame(
        [(1.0, "only"), (2.0, "only")], "v double, grp string"
    )
    r = jackknife_group_se(df, "v", "grp", quantize=2).collect()[0]
    assert r["se_q6"] is None and r["mean_q6"] == 1.5


def test_capture_recapture_python_twin(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import (
        capture_recapture,
    )

    # true population 0..99; sample A = multiples of 2, B = multiples
    # of 3 -> m = multiples of 6
    a = spark.createDataFrame([(i,) for i in range(0, 100, 2)], "id long")
    b = spark.createDataFrame([(i,) for i in range(0, 100, 3)], "id long")
    r = capture_recapture(a, b).collect()[0]
    n1, n2, m = 50, 34, 17
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    se2 = ((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
           / ((m + 1) ** 2 * (m + 2)))
    assert (r["n1"], r["n2"], r["m"]) == (n1, n2, m)
    assert r["est_q6"] == math.floor(est * 1e6) / 1e6
    assert abs(r["se_q6"] - math.sqrt(se2)) < 1e-5
    # estimate in the plausible neighborhood of the true 100
    assert 60 < r["est_q6"] < 140
    # disjoint samples -> null estimate
    c = spark.createDataFrame([(1000,)], "id long")
    r2 = capture_recapture(a, c).collect()[0]
    assert r2["est_q6"] is None


def test_conditional_entropy_extremes(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import (
        conditional_entropy,
    )

    # Y fully determined by X -> H(Y|X) = 0, U = 1
    det = spark.createDataFrame(
        [("a", "p")] * 5 + [("b", "q")] * 5, "x string, y string"
    )
    r = conditional_entropy(det, "x", "y").collect()[0]
    assert r["h_cond_q6"] == 0.0 and r["theil_u_q6"] == 1.0
    assert abs(r["h_y_q6"] - math.log(2)) < 1e-5
    # X independent of Y -> H(Y|X) = H(Y), U = 0
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "pq" for _ in range(3)],
        "x string, y string",
    )
    r2 = conditional_entropy(ind, "x", "y").collect()[0]
    assert r2["theil_u_q6"] == 0.0
    assert r2["h_cond_q6"] == r2["h_y_q6"]
    # constant Y -> H(Y) = 0, U undefined
    const = spark.createDataFrame(
        [("a", "z"), ("b", "z")], "x string, y string"
    )
    r3 = conditional_entropy(const, "x", "y").collect()[0]
    assert r3["theil_u_q6"] is None and r3["h_y_q6"] == 0.0


def test_conditional_entropy_python_twin(spark):
    import math
    import random

    from png_from_pdf_extracter_spark.functions.stats import (
        conditional_entropy,
    )

    rng = random.Random(13)
    rows = [
        (rng.choice("abc"), rng.choice("pqrs")) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "x string, y string")
    r = conditional_entropy(df, "x", "y").collect()[0]
    from collections import Counter

    cxy = Counter(rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    n = len(rows)
    hc = sum(
        c / n * math.log(cx[x] / c) for (x, y), c in sorted(cxy.items())
    )
    hy = sum(c / n * math.log(n / c) for _, c in sorted(cy.items()))
    assert abs(r["h_cond_q6"] - hc) < 2e-6
    assert abs(r["h_y_q6"] - hy) < 2e-6
    assert 0.0 <= r["theil_u_q6"] < 0.1  # independent by construction


def test_group_influence_signs_and_twin(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        group_influence,
    )

    rows = (
        [(10.0, "low")] * 4 + [(20.0, "mid")] * 4 + [(90.0, "high")] * 2
    )
    df = spark.createDataFrame(rows, "v double, grp string")
    out = {
        r["group"]: r
        for r in group_influence(df, "v", "grp", quantize=2).collect()
    }
    # removing the heavy group drops the mean -> negative delta;
    # removing a light group raises it -> positive delta
    assert out["high"]["delta_q6"] < 0
    assert out["low"]["delta_q6"] > 0
    # python twin for one group (cent units)
    s = sum(int(v * 100) for v, _ in rows)
    n = len(rows)
    s_low = 4 * 1000
    loo = (s - s_low) / (n - 4)
    import math

    exp = math.floor((loo - s / n) / 100.0 * 1e6) / 1e6
    assert out["low"]["delta_q6"] == exp
    # single-group corpus -> null delta
    one = spark.createDataFrame([(1.0, "x")], "v double, grp string")
    r = group_influence(one, "v", "grp", quantize=2).collect()[0]
    assert r["delta_q6"] is None


def test_holm_step_down_textbook(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        bh_fdr,
        holm_bonferroni,
    )

    # m=5, alpha=0.05: thresholds 0.01, 0.0125, 0.0167, 0.025, 0.05
    ps = [0.005, 0.011, 0.02, 0.04, 0.6]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    out = {
        r["p_q"]: r["reject"]
        for r in holm_bonferroni(df, "p").collect()
    }
    # 0.005 <= 0.01 reject; 0.011 <= 0.0125 reject; 0.02 > 0.0167 stop
    assert out[5000] and out[11000]
    assert not out[20000] and not out[40000] and not out[600000]
    # Holm never rejects more than BH on the same battery
    bh = {r["p_q"]: r["reject"] for r in bh_fdr(df, "p").collect()}
    assert all((not h) or bh[p] for p, h in out.items())


def test_holm_tie_convention_shares_fate(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        holm_bonferroni,
    )

    # two tied smallest p straddle the per-position threshold: with
    # min-rank ties BOTH get multiplier (m - 1 + 1) = 3 -> 0.0166
    df = spark.createDataFrame(
        [(0.012,), (0.012,), (0.5,)], "p double"
    )
    rows = holm_bonferroni(df, "p").collect()
    tied = [r for r in rows if r["p_q"] == 12000]
    assert len(tied) == 2
    assert tied[0]["reject"] == tied[1]["reject"] == True  # noqa: E712
    assert all(r["r_min"] == 1 for r in tied)


def test_mantel_haenszel_python_twin(spark):
    import math
    import random

    from png_from_pdf_extracter_spark.functions.stats import (
        mantel_haenszel,
    )

    rng = random.Random(31)
    rows = []
    for s, base_rate in (("s1", 0.2), ("s2", 0.5), ("s3", 0.7)):
        for _ in range(200):
            arm = rng.randrange(2)
            # planted uplift on the treated arm in every stratum
            p = min(0.95, base_rate + (0.15 if arm else 0.0))
            rows.append((s, arm, 1 if rng.random() < p else 0))
    df = spark.createDataFrame(rows, "s string, arm int, y int")
    r = mantel_haenszel(df, "s", "arm", "y").collect()[0]
    # python twin
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])
    for s, a, y in rows:
        idx = 0 if (a, y) == (1, 1) else 1 if (a, y) == (1, 0) else \
            2 if (a, y) == (0, 1) else 3
        cells[s][idx] += 1
    rs = ss = dev = var = 0.0
    for s in sorted(cells):
        ta, tb, tc, td = cells[s]
        n = ta + tb + tc + td
        rs += ta * td / n
        ss += tb * tc / n
        dev += ta - (ta + tb) * (ta + tc) / n
        var += ((ta + tb) * (tc + td) * (ta + tc) * (tb + td)
                / (n * n * (n - 1)))
    assert r["k_strata"] == 3
    assert abs(r["or_mh_q6"] - rs / ss) < 1e-5
    assert abs(r["chi2_q6"] - dev * dev / var) < 1e-4
    # planted uplift -> OR > 1 and clearly significant
    assert r["or_mh_q6"] > 1.2 and r["chi2_q6"] > 3.84


def test_mantel_haenszel_simpson_guard(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        mantel_haenszel,
    )

    # classic Simpson setup: within each stratum treatment is NEUTRAL
    # (same odds), but arm assignment is confounded with the stratum;
    # MH must report OR ~= 1 where the collapsed 2x2 would not
    rows = (
        [("easy", 1, 1)] * 80 + [("easy", 1, 0)] * 20
        + [("easy", 0, 1)] * 8 + [("easy", 0, 0)] * 2
        + [("hard", 1, 1)] * 2 + [("hard", 1, 0)] * 8
        + [("hard", 0, 1)] * 20 + [("hard", 0, 0)] * 80
    )
    df = spark.createDataFrame(rows, "s string, arm int, y int")
    r = mantel_haenszel(df, "s", "arm", "y").collect()[0]
    assert 0.9 < r["or_mh_q6"] < 1.1


def test_yuen_python_twin(spark):
    import math
    import random

    from png_from_pdf_extracter_spark.functions.stats import (
        yuen_trimmed_t,
    )

    rng = random.Random(47)
    rows = [(round(rng.uniform(0, 20), 2), 0) for _ in range(60)] + [
        (round(rng.uniform(4, 24), 2), 1) for _ in range(45)
    ]
    df = spark.createDataFrame(rows, "v double, arm int")
    r = yuen_trimmed_t(df, "v", "arm", quantize=2).collect()[0]

    def arm_stats(vals, trim=0.2):
        s = sorted(vals)
        n = len(s)
        g = int(n * 1 // 5)
        trimmed = s[g:n - g]
        h = len(trimmed)
        tmean = sum(trimmed) / h
        w = [min(max(x, s[g]), s[n - g - 1]) for x in s]
        sw = (sum(x * x for x in w) - sum(w) ** 2 / n) / (n - 1)
        d = (n - 1) * sw / (h * (h - 1))
        return n, h, tmean, d

    a = [int(round(v * 100)) for v, g in rows if g == 0]
    b = [int(round(v * 100)) for v, g in rows if g == 1]
    # arm A = broadcast-min group (arm col value 0) -> tagged __arm=1
    na, ha, ma, da = arm_stats(a)
    nb, hb, mb, db = arm_stats(b)
    t = (ma - mb) / math.sqrt(da + db)
    dfree = (da + db) ** 2 / (da * da / (ha - 1) + db * db / (hb - 1))
    assert (r["n_a"], r["n_b"], r["h_a"], r["h_b"]) == (na, nb, ha, hb)
    assert abs(r["tmean_a_q6"] - ma / 100.0) < 1e-5
    assert abs(r["t_q6"] - t) < 1e-5
    assert abs(r["df_q6"] - dfree) < 1e-4
    # planted +4 shift -> clearly negative t
    assert r["t_q6"] < -2.0


def test_yuen_outlier_immunity_vs_welch(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        welch_t_test,
        yuen_trimmed_t,
    )

    # identical arms except B carries two absurd outliers; Welch's t
    # is dragged, Yuen's stays near zero
    base = [float(x) for x in range(10, 50)]
    rows = [(x, 0) for x in base] + [(x, 1) for x in base] + [
        (100000.0, 1), (-90000.0, 1)
    ]
    df = spark.createDataFrame(rows, "v double, arm int")
    y = yuen_trimmed_t(df, "v", "arm", quantize=2).collect()[0]
    w = welch_t_test(df, "v", "arm", quantize=2).collect()[0]
    assert abs(y["t_q6"]) < 0.5
    assert abs(y["tmean_a_q6"] - y["tmean_b_q6"]) < 2.0
    # Welch sees a huge variance blowup instead
    assert w is not None


def test_yuen_degenerate_null(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        yuen_trimmed_t,
    )

    df = spark.createDataFrame(
        [(1.0, 0), (1.0, 0), (2.0, 1), (2.0, 1)], "v double, arm int"
    )
    r = yuen_trimmed_t(df, "v", "arm", quantize=2).collect()[0]
    # constant arms: winsorized variances 0 -> t null
    assert r["t_q6"] is None


def test_huber_python_twin_and_outlier_bound(spark):
    import math
    import random

    from png_from_pdf_extracter_spark.functions.stats import (
        huber_location,
    )

    rng = random.Random(53)
    clean = [round(rng.gauss(50, 5), 2) for _ in range(99)]
    rows = [(v, "g") for v in clean] + [(100000.0, "g")]
    df = spark.createDataFrame(rows, "v double, grp string")
    r = huber_location(df, "v", ("grp",), quantize=2).collect()[0]

    q = sorted(int(round(v * 100)) for v, _ in rows)
    n = len(q)
    med2 = q[(n + 1) // 2 - 1] + q[n // 2]
    d2 = [2 * x - med2 for x in q]
    a2 = sorted(abs(d) for d in d2)
    mad4 = a2[(n + 1) // 2 - 1] + a2[n // 2]
    cs = sum(
        max(-(mad4 * 3), min(mad4 * 3, 2 * d * 2)) for d in d2
    )
    med = med2 / 2.0
    hub = med + cs / (4.0 * n * 2.0)
    assert r["median_q6"] == math.floor(med / 100.0 * 1e6) / 1e6
    assert r["huber_q6"] == math.floor(hub / 100.0 * 1e6) / 1e6
    # the absurd outlier moves the plain mean by ~1000 but the Huber
    # estimate stays within one clipped-MAD contribution of the median
    assert abs(r["huber_q6"] - r["median_q6"]) < 1.0
    assert r["n_g"] == 100


def test_huber_symmetric_equals_median_and_mean(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        huber_location,
    )

    # perfectly symmetric data: median == huber == mean
    vals = [10.0, 20.0, 30.0, 40.0, 50.0]
    df = spark.createDataFrame([(v, "s") for v in vals], "v double, grp string")
    r = huber_location(df, "v", ("grp",), quantize=2).collect()[0]
    assert r["median_q6"] == 30.0 and r["huber_q6"] == 30.0


def test_rmst_hand_computed_and_horizon(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import rmst

    # events at t=2 (d=1 of n=4) and t=5 (d=1 of n=3); censor at t=8
    rows = [(2, 1), (5, 1), (8, 0), (10, 1)]
    df = spark.createDataFrame(rows, "t long, e int")
    r = rmst(df, "t", "e", tau=9).collect()[0]
    s1 = math.floor(math.exp(math.floor(math.log(1 - 1 / 4) * 1e9) / 1e9) * 1e6) / 1e6
    s2 = math.floor(math.exp(
        (math.floor(math.log(1 - 1 / 4) * 1e9)
         + math.floor(math.log(1 - 1 / 3) * 1e9)) / 1e9) * 1e6) / 1e6
    # S=1 on [0,2), s1 on [2,5), s2 on [5,8), s2 on [8,9) (censor step)
    exp = 2 * 1.0 + s1 * 3 + s2 * 3 + s2 * 1
    assert r["tau"] == 9 and r["t_first"] == 2
    assert abs(r["rmst_q6"] - exp) < 2e-6
    # horizon before the first event: RMST = tau exactly
    r2 = rmst(df, "t", "e", tau=2).collect()[0]
    assert r2["rmst_q6"] == 2.0
    # no censoring, far horizon: RMST below tau
    r3 = rmst(df, "t", "e", tau=100).collect()[0]
    assert r3["rmst_q6"] < 100.0


def test_slope_break_planted_kink(spark):
    from png_from_pdf_extracter_spark.functions.stats import slope_break

    # slope 2 for 20 points, then slope -1: the kink is at index 20
    rows = []
    for i in range(1, 41):
        y = 2.0 * i if i <= 20 else 40.0 - 1.0 * (i - 20)
        rows.append(("g", i, y))
    df = spark.createDataFrame(rows, "g string, o int, v double")
    r = slope_break(df, ("g",), ("o",), "v", quantize=2).collect()[0]
    assert abs(r["break_idx"] - 20) <= 1
    assert 1.8 < r["slope_l_q6"] < 2.2
    assert -1.2 < r["slope_r_q6"] < -0.8
    # two-line fit dramatically beats one line on a kinked series
    assert r["gain_q6"] > 0.9
    assert r["sse_break_q2"] < r["sse_single_q2"]


def test_slope_break_pure_line_no_gain(spark):
    from png_from_pdf_extracter_spark.functions.stats import slope_break

    rows = [("g", i, 3.0 * i + 7.0) for i in range(1, 31)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    r = slope_break(df, ("g",), ("o",), "v", quantize=2).collect()[0]
    # a perfect line: both segment slopes equal the global slope and
    # the SSE gain is ~0 (single-line SSE is already ~0)
    assert abs(r["slope_l_q6"] - 3.0) < 0.01
    assert abs(r["slope_r_q6"] - 3.0) < 0.01
    assert r["sse_break_q2"] <= r["sse_single_q2"]


def test_slope_break_short_group_absent(spark):
    from png_from_pdf_extracter_spark.functions.stats import slope_break

    rows = [("tiny", i, float(i)) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    # n=4 < 2*min_seg=6: no candidate rows -> no output row
    assert slope_break(df, ("g",), ("o",), "v").count() == 0


def test_interrater_reliability_numpy_twin(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        interrater_reliability,
    )
    import numpy as np

    # 6 subjects x 3 items, correlated columns -> high alpha
    mat = np.array(
        [
            [4, 5, 4],
            [3, 3, 4],
            [5, 5, 5],
            [2, 2, 3],
            [4, 4, 5],
            [1, 2, 1],
        ],
        dtype=float,
    )
    rows = [
        (s, f"item{i}", float(mat[s, i]))
        for s in range(mat.shape[0])
        for i in range(mat.shape[1])
    ]
    df = spark.createDataFrame(rows, "s long, i string, v double")
    r = interrater_reliability(df, "s", "i", "v", quantize=0).collect()[0]
    n, k = mat.shape
    item_var = mat.var(axis=0, ddof=1).sum()
    tot_var = mat.sum(axis=1).var(ddof=1)
    alpha = k / (k - 1) * (1 - item_var / tot_var)
    # two-way ANOVA mean squares for ICC(2,1)
    g = mat.sum()
    cf = g * g / (n * k)
    ss_tot = (mat**2).sum() - cf
    ss_rows = (mat.sum(axis=1) ** 2).sum() / k - cf
    ss_cols = (mat.sum(axis=0) ** 2).sum() / n - cf
    msr = ss_rows / (n - 1)
    msc = ss_cols / (k - 1)
    mse = (ss_tot - ss_rows - ss_cols) / ((n - 1) * (k - 1))
    icc2 = (msr - mse) / (msr + (k - 1) * mse + k * (msc - mse) / n)
    assert r["n_subjects"] == n and r["k_items"] == k
    assert abs(r["alpha_q6"] - alpha) < 2e-6
    assert abs(r["icc2_q6"] - icc2) < 2e-6
    assert r["alpha_q6"] > 0.8  # coherent items


def test_interrater_reliability_uncorrelated_low_alpha(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        interrater_reliability,
    )

    # anti-correlated items -> alpha near or below 0
    rows = []
    for s in range(8):
        rows.append((s, "a", float(s)))
        rows.append((s, "b", float(7 - s)))
    df = spark.createDataFrame(rows, "s long, i string, v double")
    r = interrater_reliability(df, "s", "i", "v", quantize=0).collect()[0]
    assert r["alpha_q6"] is None or r["alpha_q6"] < 0.1


def test_concordance_perfect_and_shifted(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        concordance_agreement,
    )

    rows = [("g", float(i), float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = concordance_agreement(df, "x", "y", ("g",), quantize=2).collect()[0]
    assert r["ccc_q6"] >= 1.0 - 2e-6 and r["pearson_q6"] >= 1.0 - 2e-6
    assert abs(r["bias_q6"]) < 1e-6
    assert abs(r["loa_lo_q6"]) < 1e-6 and abs(r["loa_hi_q6"]) < 1e-6

    # constant shift: pearson stays 1, CCC drops, bias = shift
    rows2 = [("g", float(i), float(i) + 5.0) for i in range(1, 21)]
    df2 = spark.createDataFrame(rows2, "g string, x double, y double")
    r2 = concordance_agreement(df2, "x", "y", ("g",), quantize=2).collect()[
        0
    ]
    assert r2["pearson_q6"] >= 1.0 - 2e-6
    assert r2["ccc_q6"] < 0.8
    assert abs(r2["bias_q6"] + 5.0) < 1e-5


def test_concordance_numpy_twin(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        concordance_agreement,
    )
    import numpy as np

    rng = [
        (3.1, 2.7), (4.0, 4.4), (5.5, 5.0), (2.2, 2.9), (6.1, 5.8),
        (7.3, 7.9), (1.4, 1.1), (8.8, 8.1), (0.5, 0.9), (9.9, 9.2),
    ]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in rng], "g string, x double, y double"
    )
    r = concordance_agreement(df, "x", "y", ("g",), quantize=2).collect()[0]
    x = np.array([round(v[0] * 100) for v in rng], dtype=float)
    y = np.array([round(v[1] * 100) for v in rng], dtype=float)
    n = len(x)
    cxx, cyy = x.var(), y.var()
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    ccc = 2 * cxy / (cxx + cyy + (x.mean() - y.mean()) ** 2)
    d = x - y
    bias = d.mean() / 100.0
    half = 1.96 * d.std(ddof=1) / 100.0
    assert abs(r["ccc_q6"] - ccc) < 2e-6
    assert abs(r["bias_q6"] - bias) < 2e-6
    assert abs(r["loa_lo_q6"] - (bias - half)) < 2e-6
    assert abs(r["loa_hi_q6"] - (bias + half)) < 2e-6


def _lcg_seq(n, seed=12345):
    """Deterministic pseudo-noise in [0, 99]."""
    out, s = [], seed
    for _ in range(n):
        s = (1103515245 * s + 12345) % (2**31)
        out.append((s >> 16) % 100)
    return out


def test_ljung_box_numpy_twin_and_whiteness(spark):
    from png_from_pdf_extracter_spark.functions.stats import ljung_box
    import numpy as np

    vals = _lcg_seq(200)
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    out = {
        r["lag"]: r
        for r in ljung_box(
            df, ("g",), ("o",), "v", max_lag=5, quantize=0
        ).collect()
    }
    x = np.array(vals, dtype=float)
    n = len(x)
    xc = x - x.mean()
    den = (xc**2).sum()
    q = 0.0
    for k in range(1, 6):
        r = (xc[k:] * xc[:-k]).sum() / den
        q += r * r / (n - k)
        assert abs(out[k]["r_q6"] - r) < 2e-6, k
        assert abs(out[k]["q_stat_q6"] - n * (n + 2) * q) < 1e-4, k
    # pseudo-noise: Q(5) far below the chi2 tail for strong structure
    assert out[5]["q_stat_q6"] < 30.0


def test_ljung_box_autocorrelated_series_big_q(spark):
    from png_from_pdf_extracter_spark.functions.stats import ljung_box

    # slow sine-ish alternation: strong lag-1 correlation
    rows = [("g", i, float(10 + (i % 10))) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    out = {
        r["lag"]: r
        for r in ljung_box(
            df, ("g",), ("o",), "v", max_lag=5, quantize=0
        ).collect()
    }
    assert out[1]["r_q6"] > 0.4
    assert out[5]["q_stat_q6"] > 100.0


def test_kpss_walk_vs_noise(spark):
    from png_from_pdf_extracter_spark.functions.stats import kpss_level
    import numpy as np

    noise = _lcg_seq(300, seed=7)
    walk = np.cumsum(np.array(noise) - 49.5).tolist()
    rows = [("noise", i, float(v)) for i, v in enumerate(noise)]
    rows += [("walk", i, float(v)) for i, v in enumerate(walk)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    out = {
        r["g"]: r["kpss_q6"]
        for r in kpss_level(df, ("g",), ("o",), "v", quantize=1).collect()
    }
    # stationarity: noise well under the 1% critical value (0.739),
    # a random walk far above it
    assert out["noise"] < 0.739
    assert out["walk"] > 0.739
    # numpy twin for the noise series
    x = np.round(np.array(noise, dtype=float) * 10)
    s = np.cumsum(x - x.mean())
    eta = (s**2).sum() / (len(x) ** 2 * x.var())
    assert abs(out["noise"] - eta) < 1e-5


def test_variance_ratio_direction(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        variance_ratio,
    )

    noise = _lcg_seq(300, seed=99)
    trend = [v + 5 * i for i, v in enumerate(noise)]  # trending
    alt = [100 if i % 2 else 0 for i in range(300)]  # mean-reverting
    rows = (
        [("noise", i, float(v)) for i, v in enumerate(noise)]
        + [("trend", i, float(v)) for i, v in enumerate(trend)]
        + [("alt", i, float(v)) for i, v in enumerate(alt)]
    )
    df = spark.createDataFrame(rows, "g string, o int, v double")
    out = {
        r["g"]: r
        for r in variance_ratio(
            df, ("g",), ("o",), "v", q=5, quantize=0
        ).collect()
    }
    assert out["noise"]["n_windows"] == 300 - 5 + 1
    assert 0.5 < out["noise"]["vr_q6"] < 1.5
    assert out["trend"]["vr_q6"] > 2.0
    assert out["alt"]["vr_q6"] < 0.3


def test_inequality_indices_equal_and_concentrated(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        inequality_indices,
    )
    import math

    rows = [("eq", 50.0)] * 10 + [("con", 1.0)] * 9 + [("con", 991.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r
        for r in inequality_indices(df, "v", ("g",), quantize=0).collect()
    }
    assert abs(out["eq"]["theil_q6"]) < 2e-6
    assert abs(out["eq"]["atkinson_q6"]) < 2e-6
    # numpy twin for the concentrated group
    xs = [1.0] * 9 + [991.0]
    n, tot = len(xs), sum(xs)
    theil = sum(x / tot * math.log(x * n / tot) for x in xs)
    geo = math.exp(sum(math.log(x) for x in xs) / n)
    atk = 1.0 - geo / (tot / n)
    assert abs(out["con"]["theil_q6"] - theil) < 1e-5
    assert abs(out["con"]["atkinson_q6"] - atk) < 1e-5
    assert out["con"]["theil_q6"] > 1.5 and out["con"]["atkinson_q6"] > 0.9


def test_inequality_drops_nonpositive(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        inequality_indices,
    )

    df = spark.createDataFrame(
        [("g", 0.0), ("g", -5.0), ("g", 10.0), ("g", 10.0)],
        "g string, v double",
    )
    r = inequality_indices(df, "v", ("g",), quantize=0).collect()[0]
    assert r["n"] == 2 and abs(r["theil_q6"]) < 2e-6


def test_srm_balanced_and_planted(spark):
    from png_from_pdf_extracter_spark.functions.stats import srm_check

    bal = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "arm string"
    )
    r = srm_check(bal, "arm", {"a": 1, "b": 1}).collect()[0]
    assert r["chi2_q6"] == 0.0 and r["n"] == 100 and r["k_arms"] == 2
    # planted 70/30 against 50/50: chi2 = (20^2/50)*2 = 16
    skew = spark.createDataFrame(
        [("a",)] * 70 + [("b",)] * 30, "arm string"
    )
    r2 = srm_check(skew, "arm", {"a": 1, "b": 1}).collect()[0]
    assert abs(r2["chi2_q6"] - 16.0) < 2e-6
    # rogue arm is counted, not folded into chi2
    rogue = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50 + [("zz",)] * 5, "arm string"
    )
    r3 = srm_check(rogue, "arm", {"a": 1, "b": 1}).collect()[0]
    assert r3["n_unexpected"] == 5 and r3["n"] == 100
    assert r3["chi2_q6"] == 0.0


def test_forecast_accuracy_perfect_seasonal(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        forecast_accuracy,
    )

    # exactly periodic series: seasonal-naive is perfect
    rows = [("g", t, float(10 + (t % 7))) for t in range(28)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    r = forecast_accuracy(
        df, ("g",), ("t",), "v", season=7, quantize=0
    ).collect()[0]
    assert r["n"] == 28 and r["n_eval"] == 21
    for c in ("mae_q6", "rmse_q6", "smape_q6", "mape_q6", "pinball90_q6"):
        assert r[c] == 0.0, c
    assert r["mase_q6"] == 0.0


def test_forecast_accuracy_hand_computed(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        forecast_accuracy,
    )
    import math

    vals = [10.0, 12.0, 9.0, 11.0, 15.0, 8.0]
    rows = [("g", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    r = forecast_accuracy(
        df, ("g",), ("t",), "v", season=2, quantize=0
    ).collect()[0]
    # f_t = x_{t-2}: errors for t=2..5: (9-10), (11-12), (15-9), (8-11)
    errs = [-1.0, -1.0, 6.0, -3.0]
    mae = sum(abs(e) for e in errs) / 4
    rmse = math.sqrt(sum(e * e for e in errs) / 4)
    assert abs(r["mae_q6"] - mae) < 2e-6
    assert abs(r["rmse_q6"] - rmse) < 2e-6
    # naive-1 MAE: diffs 2,3,2,4,7 -> 18/5
    assert abs(r["mase_q6"] - mae / (18.0 / 5.0)) < 2e-6
    # pinball 0.9: d>=0 -> .9d, d<0 -> .1|d|: (.1+.1+5.4+.3)/4
    assert abs(r["pinball90_q6"] - (0.1 + 0.1 + 5.4 + 0.3) / 4) < 2e-6
    smape = sum(
        2 * abs(e) / (abs(x) + abs(f))
        for e, x, f in zip(errs, vals[2:], vals[:4])
    ) / 4
    assert abs(r["smape_q6"] - smape) < 2e-6
    mape = sum(
        abs(e) / abs(x) for e, x in zip(errs, vals[2:])
    ) / 4
    assert abs(r["mape_q6"] - mape) < 2e-6


def test_forecast_accuracy_constant_series_mase_null(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        forecast_accuracy,
    )

    rows = [("g", t, 5.0) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    r = forecast_accuracy(
        df, ("g",), ("t",), "v", season=3, quantize=0
    ).collect()[0]
    assert r["mase_q6"] is None  # naive-1 MAE is 0: undefined
    assert r["mae_q6"] == 0.0


def _midranks(vals, pool):
    """Midrank of each v in vals within the sorted pool."""
    import bisect

    sp = sorted(pool)
    out = []
    for v in vals:
        lo = bisect.bisect_left(sp, v)
        hi = bisect.bisect_right(sp, v)
        out.append((lo + 1 + hi) / 2.0)
    return out


def test_brunner_munzel_python_twin(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        brunner_munzel,
    )
    import math

    xs = [1.0, 2.0, 2.0, 4.0, 5.0, 7.0, 7.0, 9.0]
    ys = [3.0, 4.0, 4.0, 6.0, 7.0, 8.0, 10.0, 12.0, 12.0]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = brunner_munzel(df, "v", "g", "a", "b", quantize=0).collect()[0]

    pool = xs + ys
    na, nb = len(xs), len(ys)
    rx = _midranks(xs, pool)
    ry = _midranks(ys, pool)
    rxw = _midranks(xs, xs)
    ryw = _midranks(ys, ys)
    rbx, rby = sum(rx) / na, sum(ry) / nb
    s2x = sum(
        (rx[i] - rxw[i] - rbx + (na + 1) / 2.0) ** 2 for i in range(na)
    ) / (na - 1)
    s2y = sum(
        (ry[i] - ryw[i] - rby + (nb + 1) / 2.0) ** 2 for i in range(nb)
    ) / (nb - 1)
    t = na * s2x + nb * s2y
    w = na * nb * (rby - rbx) / (na + nb) / math.sqrt(t)
    dof = t * t / (
        (na * s2x) ** 2 / (na - 1) + (nb * s2y) ** 2 / (nb - 1)
    )
    p_hat = (rby - (nb + 1) / 2.0) / na
    assert r["n_a"] == na and r["n_b"] == nb
    assert abs(r["p_hat_q6"] - p_hat) < 2e-6
    assert abs(r["w_q6"] - w) < 2e-6
    assert abs(r["df_q6"] - dof) < 1e-4
    assert r["p_hat_q6"] > 0.5  # b stochastically larger


def test_brunner_munzel_symmetric_near_zero(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        brunner_munzel,
    )

    rows = [("a", float(i)) for i in range(20)] + [
        ("b", float(i) + 0.5) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = brunner_munzel(df, "v", "g", "a", "b", quantize=1).collect()[0]
    # near-identical distributions: p_hat ~ 0.5, |W| small
    assert abs(r["p_hat_q6"] - 0.5) < 0.06
    assert abs(r["w_q6"]) < 1.0


def test_brunner_munzel_disjoint_degenerate(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        brunner_munzel,
    )

    rows = [("a", 1.0)] * 5 + [("b", 9.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    r = brunner_munzel(df, "v", "g", "a", "b", quantize=0).collect()[0]
    # complete separation with constant samples: variance 0 -> W null
    assert r["w_q6"] is None and r["df_q6"] is None
    assert r["p_hat_q6"] == 1.0


def test_hurst_regimes(spark):
    from png_from_pdf_extracter_spark.functions.stats import hurst_rs
    import numpy as np

    noise = _lcg_seq(512, seed=3)
    rng_walk = np.cumsum(np.array(_lcg_seq(512, seed=5)) - 49.5)
    alt = [100.0 if i % 2 else 0.0 for i in range(512)]
    rows = (
        [("noise", i, float(v)) for i, v in enumerate(noise)]
        + [("walk", i, float(v)) for i, v in enumerate(rng_walk)]
        + [("alt", i, float(v)) for i, v in enumerate(alt)]
    )
    df = spark.createDataFrame(rows, "g string, o int, v double")
    out = hurst_rs(
        df, ("g",), ("o",), "v", block_sizes=(8, 16, 32, 64), quantize=1
    ).collect()
    h = {r["g"]: r["hurst_q6"] for r in out}
    per = {(r["g"], r["block_m"]): r for r in out}
    # each group has all 4 size rows with full block counts
    assert per[("noise", 8)]["n_blocks"] == 64
    assert per[("noise", 64)]["n_blocks"] == 8
    # iid noise ~ 0.5 (R/S bias pulls slightly high at small m)
    assert 0.35 < h["noise"] < 0.72
    # integrated walk: persistent, near 1
    assert h["walk"] > 0.8
    # strict alternation: strongly anti-persistent
    assert h["alt"] < 0.2
    # rs_mean grows with block size for the walk
    assert (
        per[("walk", 64)]["rs_mean_q6"] > per[("walk", 8)]["rs_mean_q6"]
    )


def test_hurst_short_group_null_fit(spark):
    from png_from_pdf_extracter_spark.functions.stats import hurst_rs

    # only 10 points: just the m=8 size yields a complete block ->
    # single ln point, slope undefined
    rows = [("g", i, float(i % 3)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    out = hurst_rs(
        df, ("g",), ("o",), "v", block_sizes=(8, 16, 32, 64), quantize=0
    ).collect()
    assert len(out) == 1 and out[0]["block_m"] == 8
    assert out[0]["hurst_q6"] is None


def test_kendalls_w_unanimous_and_random(spark):
    from png_from_pdf_extracter_spark.functions.stats import kendalls_w

    # 6 subjects all rank treatments identically -> W = 1
    rows = [
        (s, t, float(t)) for s in range(6) for t in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "subj long, trt int, v double")
    r = kendalls_w(df, "subj", "trt", "v", quantize=0).collect()[0]
    assert r["n_subjects"] == 6 and r["k"] == 4
    assert r["w_q6"] >= 1.0 - 1e-5
    # derivation contract: W = Q/(n(k-1)) off the emitted Q
    assert abs(r["w_q6"] - r["q_q6"] / (6 * 3)) < 2e-6
    # scrambled preferences -> near 0
    prefs = [
        [1, 2, 3, 4], [4, 3, 2, 1], [2, 4, 1, 3],
        [3, 1, 4, 2], [1, 4, 2, 3], [4, 1, 3, 2],
    ]
    rows2 = [
        (s, t + 1, float(p[t]))
        for s, p in enumerate(prefs)
        for t in range(4)
    ]
    df2 = spark.createDataFrame(rows2, "subj long, trt int, v double")
    r2 = kendalls_w(df2, "subj", "trt", "v", quantize=0).collect()[0]
    assert r2["w_q6"] < 0.2


def test_grubbs_planted_outlier(spark):
    from png_from_pdf_extracter_spark.functions.stats import grubbs_test
    import math

    vals = [10.0] * 9 + [11.0] * 10 + [50.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v double"
    )
    r = grubbs_test(df, "v", ("g",), quantize=0).collect()[0]
    assert r["outlier_value_q"] == 50.0
    n = len(vals)
    mean = sum(vals) / n
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
    assert abs(r["g_q6"] - abs(50.0 - mean) / sd) < 2e-6
    assert r["g_q6"] > 3.0  # clearly beyond any 5% critical value
    # constant group: G undefined
    dfc = spark.createDataFrame(
        [("c", 5.0)] * 8, "g string, v double"
    )
    rc = grubbs_test(dfc, "v", ("g",), quantize=0).collect()[0]
    assert rc["g_q6"] is None


def test_effect_sizes_numpy_twin(spark):
    from png_from_pdf_extracter_spark.functions.stats import effect_sizes
    import math

    xs = [12.0, 14.0, 11.0, 15.0, 13.0, 16.0, 12.0, 14.0]
    ys = [10.0, 11.0, 9.0, 10.0, 12.0, 11.0]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = effect_sizes(df, "v", "g", "a", "b", quantize=1).collect()[0]
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = sum((v - ma) ** 2 for v in xs) / (na - 1)
    vb = sum((v - mb) ** 2 for v in ys) / (nb - 1)
    sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    d = (ma - mb) / sp
    g = d * (1 - 3.0 / (4 * (na + nb) - 9))
    assert abs(r["mean_diff_q"] - (ma - mb)) < 1e-5
    assert abs(r["d_q6"] - d) < 1e-5
    assert abs(r["g_q6"] - g) < 1e-5
    assert abs(r["glass_q6"] - (ma - mb) / math.sqrt(vb)) < 1e-5
    assert abs(r["g_q6"]) < abs(r["d_q6"])  # correction shrinks


def test_partial_corr_confounder_removed(spark):
    from png_from_pdf_extracter_spark.functions.stats import partial_corr

    # x and y both driven by z; no direct link -> partial ~ 0
    rows = []
    for i in range(200):
        z = float(i % 50)
        noise_x = float((i * 7) % 11) - 5.0
        noise_y = float((i * 13) % 11) - 5.0
        rows.append((2.0 * z + noise_x, 3.0 * z + noise_y, z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = partial_corr(df, "x", "y", "z", quantize=1).collect()[0]
    assert r["r_xy_q6"] > 0.9  # raw correlation looks strong
    assert abs(r["partial_q6"]) < 0.2  # vanishes given z


def test_gini_gain_perfect_and_useless_feature(spark):
    from png_from_pdf_extracter_spark.functions.stats import gini_gain

    # feature == label: split is pure -> gain = parent impurity
    rows = [(f"f{i % 3}", f"y{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "f string, y string")
    r = gini_gain(df, "f", "y").collect()[0]
    assert abs(r["gini_parent_q6"] - (1 - 3 * (1 / 3) ** 2)) < 2e-6
    assert r["gini_split_q6"] == 0.0
    assert abs(r["gain_q6"] - r["gini_parent_q6"]) < 2e-6
    # independent feature: no gain
    rows2 = [(f"f{i % 2}", f"y{i % 3}") for i in range(120)]
    df2 = spark.createDataFrame(rows2, "f string, y string")
    r2 = gini_gain(df2, "f", "y").collect()[0]
    assert abs(r2["gain_q6"]) < 2e-6


def test_risk_ratios_hand_table(spark):
    from png_from_pdf_extracter_spark.functions.stats import risk_ratios
    import math

    # a=30 b=70 c=10 d=90: RR = .3/.1 = 3, OR = 30*90/(70*10)
    rows = (
        [(True, True)] * 30 + [(True, False)] * 70
        + [(False, True)] * 10 + [(False, False)] * 90
    )
    df = spark.createDataFrame(rows, "e boolean, o boolean")
    r = risk_ratios(df, "e", "o").collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (30, 70, 10, 90)
    assert abs(r["rr_q6"] - 3.0) < 2e-6
    orr = 30 * 90 / (70 * 10.0)
    assert abs(r["or_q6"] - orr) < 2e-6
    se = math.sqrt(1 / 30 - 1 / 100 + 1 / 10 - 1 / 100)
    assert abs(r["rr_lo_q6"] - math.exp(math.log(3) - 1.96 * se)) < 1e-5
    assert abs(r["rr_hi_q6"] - math.exp(math.log(3) + 1.96 * se)) < 1e-5
    assert r["rr_lo_q6"] > 1.0  # significantly protective exposure? no: risky
    # empty cell -> nulls
    df2 = spark.createDataFrame(
        [(True, True)] * 5 + [(False, False)] * 5, "e boolean, o boolean"
    )
    r2 = risk_ratios(df2, "e", "o").collect()[0]
    assert r2["rr_q6"] is None and r2["or_q6"] is None


def test_quade_planted_effect_vs_flat(spark):
    from png_from_pdf_extracter_spark.functions.stats import quade_test

    # treatment 3 always best, margins scale with block index
    rows = []
    for b in range(12):
        for t in range(1, 4):
            rows.append((b, t, float(t * (b + 1) * 10)))
    df = spark.createDataFrame(rows, "subj long, trt int, v double")
    r = quade_test(df, "subj", "trt", "v", quantize=0).collect()[0]
    assert r["n_blocks"] == 12 and r["k"] == 3
    assert r["f_q6"] > 10.0  # strong consistent ordering
    # flat blocks: all values tied -> ranks tie -> degenerate null
    flat = [(b, t, 5.0) for b in range(6) for t in range(1, 4)]
    df2 = spark.createDataFrame(flat, "subj long, trt int, v double")
    assert quade_test(df2, "subj", "trt", "v").collect()[0]["f_q6"] is None


def test_seasonal_decompose_planted_weekcycle(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        seasonal_decompose,
    )

    # pure period-7 cycle + slow trend: high seasonal AND trend strength
    amp = [0, 30, 10, -20, 5, -15, -10]
    rows = [
        ("g", t, float(100 + t + amp[t % 7])) for t in range(70)
    ]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = {
        r["phase"]: r
        for r in seasonal_decompose(
            df, ("g",), ("t",), "v", period=7, quantize=0
        ).collect()
    }
    assert len(out) == 7
    r0 = out[0]
    assert r0["f_seasonal_q6"] > 0.95
    assert r0["f_trend_q6"] > 0.95
    # seasonal indices recover the planted amplitudes (centered; the
    # planted amps already sum to 0)
    for ph in range(7):
        # phase p corresponds to t with t%7 == (p+?): t starts at 0,
        # rn starts at 1 -> phase = (rn-1)%7 = t%7
        assert abs(out[ph]["seasonal_q6"] - amp[ph]) < 1.5, ph
    # seasonal indices sum to ~0 by construction
    assert abs(sum(r["seasonal_q6"] for r in out.values())) < 1e-3


def test_seasonal_decompose_white_noise_low_strength(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        seasonal_decompose,
    )

    vals = _lcg_seq(140, seed=11)
    rows = [("g", t, float(v)) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = seasonal_decompose(
        df, ("g",), ("t",), "v", period=7, quantize=0
    ).collect()
    # iid noise: neither component explains much
    assert all(r["f_seasonal_q6"] < 0.5 for r in out)
    assert all(r["f_trend_q6"] < 0.5 for r in out)


def test_seasonal_decompose_even_period_rejected(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        seasonal_decompose,
    )
    import pytest

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, v double")
    with pytest.raises(ValueError):
        seasonal_decompose(df, ("g",), ("t",), "v", period=6)


def _ab_ref(xs, ys):
    """Direct Ansari-Bradley with R-style tie-averaged scores."""
    pool = sorted(xs + ys)
    n = len(pool)
    score = [min(i + 1, n - i) for i in range(n)]  # positions 1..N
    # average scores over tied values
    from collections import defaultdict

    by_val = defaultdict(list)
    for i, v in enumerate(pool):
        by_val[v].append(score[i])
    avg = {v: sum(s) / len(s) for v, s in by_val.items()}
    ab = sum(avg[v] for v in xs)
    s1 = sum(score)
    s2 = sum(len(s) * (sum(s) / len(s)) ** 2 for s in by_val.values())
    na, nb = len(xs), len(ys)
    e = na * s1 / n
    var = na * nb * (n * s2 - s1 * s1) / (n * n * (n - 1))
    return ab, e, var


def test_ansari_bradley_python_twin(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        ansari_bradley,
    )
    import math

    xs = [1.0, 3.0, 3.0, 5.0, 9.0, 12.0, 12.0]
    ys = [4.0, 5.0, 6.0, 6.0, 7.0, 8.0]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ansari_bradley(df, "v", "g", "a", "b", quantize=0).collect()[0]
    ab, e, var = _ab_ref(xs, ys)
    assert r["n_a"] == 7 and r["n_b"] == 6
    assert abs(r["ab_q6"] - ab) < 2e-6
    assert abs(r["z_q6"] - (ab - e) / math.sqrt(var)) < 2e-6
    # a is wide, b is narrow: b's scores high, a's low -> z negative
    assert r["z_q6"] < 0


def test_ansari_bradley_equal_spread_near_zero(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        ansari_bradley,
    )

    xs = [float(i) for i in range(40)]
    ys = [float(i) + 0.5 for i in range(40)]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ansari_bradley(df, "v", "g", "a", "b", quantize=1).collect()[0]
    assert abs(r["z_q6"]) < 1.0


def test_cucconi_python_twin(spark):
    from png_from_pdf_extracter_spark.functions.stats import cucconi_test
    import math

    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    ys = [2.5, 3.5, 3.5, 5.5, 6.5, 10.0, 11.0]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = cucconi_test(df, "v", "g", "a", "b", quantize=1).collect()[0]

    pool = sorted(xs + ys)
    n = len(pool)
    s_ranks = _midranks(ys, pool)
    ss2 = sum(s * s for s in s_ranks)
    sc2 = sum((n + 1 - s) ** 2 for s in s_ranks)
    na, nb = len(xs), len(ys)
    den = math.sqrt(
        na * nb * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0
    )
    u = (6 * ss2 - nb * (n + 1) * (2 * n + 1)) / den
    v = (6 * sc2 - nb * (n + 1) * (2 * n + 1)) / den
    rho = 2 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
    cref = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert abs(r["u_q6"] - u) < 1e-5
    assert abs(r["v_q6"] - v) < 1e-5
    assert abs(r["c_q6"] - cref) < 1e-5


def test_cucconi_detects_scale_shift_mw_misses(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        cucconi_test,
        mann_whitney_u,
    )

    # same center, very different spread: MW AUC ~ 0.5, Cucconi large
    xs = [float(v) for v in range(45, 56)] * 4  # tight around 50
    ys = [float(v) for v in range(0, 101, 5)] * 2  # wide around 50
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    mw = mann_whitney_u(df, "v", "g", "a", "b", quantize=0).collect()[0]
    cu = cucconi_test(df, "v", "g", "a", "b", quantize=0).collect()[0]
    assert abs(mw["auc_a"] - 0.5) < 0.05
    assert cu["c_q6"] > 3.0


def test_gwet_ac1_prevalence_vs_kappa_shape(spark):
    from png_from_pdf_extracter_spark.functions.stats import gwet_ac1

    # 95% of items are label 'x' and raters agree on them; they split
    # on the rare label -> po is high, AC1 stays high (kappa would not)
    rows = [("x", "x")] * 95 + [("y", "z")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    r = gwet_ac1(df, "a", "b").collect()[0]
    assert r["n"] == 100 and r["q_labels"] == 3
    assert abs(r["po_q6"] - 0.95) < 2e-6
    assert r["ac1_q6"] > 0.9
    # perfect agreement -> AC1 = 1
    df2 = spark.createDataFrame(
        [("p", "p")] * 10 + [("q", "q")] * 10, "a string, b string"
    )
    r2 = gwet_ac1(df2, "a", "b").collect()[0]
    assert r2["ac1_q6"] >= 1.0 - 2e-6
    # hand pe for the first table: margins x: (95+95), y: (5+0), z: (0+5)
    pi = [190 / 200, 5 / 200, 5 / 200]
    pe = sum(p * (1 - p) for p in pi) / 2
    assert abs(r["pe_q6"] - pe) < 2e-6


def test_bowker_directional_vs_symmetric(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        bowker_symmetry,
    )

    # symmetric disagreements: x->y 10, y->x 10 -> chi2 = 0
    rows = [("x", "y")] * 10 + [("y", "x")] * 10 + [("x", "x")] * 30
    df = spark.createDataFrame(rows, "a string, b string")
    r = bowker_symmetry(df, "a", "b").collect()[0]
    assert r["chi2_q6"] == 0.0 and r["n_offdiag_pairs"] == 1
    assert r["n"] == 50
    # one-way drift: x->y 20, y->x 2 -> (18)^2/22
    rows2 = [("x", "y")] * 20 + [("y", "x")] * 2 + [("z", "z")] * 5
    df2 = spark.createDataFrame(rows2, "a string, b string")
    r2 = bowker_symmetry(df2, "a", "b").collect()[0]
    assert abs(r2["chi2_q6"] - 18 * 18 / 22.0) < 2e-6


def test_hellinger_identical_and_disjoint(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        hellinger_distance,
    )
    import math

    same = [("a", float(v % 5)) for v in range(50)] + [
        ("b", float(v % 5)) for v in range(50)
    ]
    df = spark.createDataFrame(same, "g string, v double")
    r = hellinger_distance(df, "v", "g", "a", "b", quantize=0).collect()[
        0
    ]
    assert r["bc_q6"] >= 1.0 - 2e-6
    assert r["hellinger_q6"] <= 1e-3
    # disjoint support: BC = 0, H = 1
    dis = [("a", float(v)) for v in range(10)] + [
        ("b", float(v) + 100.0) for v in range(10)
    ]
    df2 = spark.createDataFrame(dis, "g string, v double")
    r2 = hellinger_distance(df2, "v", "g", "a", "b", quantize=0).collect()[
        0
    ]
    assert r2["bc_q6"] == 0.0 and r2["hellinger_q6"] == 1.0
    # hand case: p = (.5, .5), q = (1, 0)
    h3rows = [("a", 0.0)] * 5 + [("a", 1.0)] * 5 + [("b", 0.0)] * 8
    df3 = spark.createDataFrame(h3rows, "g string, v double")
    r3 = hellinger_distance(df3, "v", "g", "a", "b", quantize=0).collect()[
        0
    ]
    bc = math.sqrt(0.5 * 1.0)
    assert abs(r3["bc_q6"] - bc) < 2e-6
    assert abs(r3["hellinger_q6"] - math.sqrt(1 - bc)) < 2e-6


def test_woolf_homogeneous_vs_heterogeneous(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        woolf_homogeneity,
    )
    import math

    # two strata with the SAME OR ~ 4 -> tiny chi2
    def stratum(name, a, b, c, d):
        rows = (
            [(name, 1, 1)] * a + [(name, 1, 0)] * b
            + [(name, 0, 1)] * c + [(name, 0, 0)] * d
        )
        return rows

    homo = stratum("s1", 40, 10, 10, 10) + stratum("s2", 80, 20, 20, 20)
    df = spark.createDataFrame(homo, "s string, arm int, o int")
    r = woolf_homogeneity(df, "s", "arm", "o").collect()[0]
    assert r["k_strata"] == 2
    assert r["chi2_q6"] < 0.1
    # pooled OR near 4 (Haldane pulls slightly)
    assert 3.0 < r["pooled_or_q6"] < 5.0

    # opposite effects (OR 4 vs OR 1/4): chi2 blows past the df=1
    # critical value
    het = stratum("s1", 40, 10, 10, 10) + stratum("s2", 10, 40, 40, 10)
    df2 = spark.createDataFrame(het, "s string, arm int, o int")
    r2 = woolf_homogeneity(df2, "s", "arm", "o").collect()[0]
    assert r2["chi2_q6"] > 10.0

    # python twin for the homogeneous case
    def cellstats(a, b, c, d):
        a, b, c, d = a + 0.5, b + 0.5, c + 0.5, d + 0.5
        lnor = math.log(a * d / (b * c))
        w = 1.0 / (1 / a + 1 / b + 1 / c + 1 / d)
        return lnor, w

    l1, w1 = cellstats(40, 10, 10, 10)
    l2, w2 = cellstats(80, 20, 20, 20)
    pool = (w1 * l1 + w2 * l2) / (w1 + w2)
    chi2 = w1 * (l1 - pool) ** 2 + w2 * (l2 - pool) ** 2
    assert abs(r["pooled_or_q6"] - math.exp(pool)) < 1e-5
    assert abs(r["chi2_q6"] - chi2) < 1e-5


def test_competing_risks_python_twin_and_bounds(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        competing_risks_cif,
    )
    import math

    # (duration, cause): cause 0 censored, 1, 2 competing
    obs = [
        (1, 1), (1, 2), (2, 0), (3, 1), (3, 1), (4, 2), (5, 0),
        (6, 1), (7, 2), (8, 0),
    ]
    df = spark.createDataFrame(obs, "dur int, cause int")
    rows = competing_risks_cif(df, "dur", "cause").collect()
    got = {(r["cause"], r["t"]): r for r in rows}

    # python twin with the same 1e-9-quantized-log survival
    times = sorted({t for t, _ in obs})
    n = len(obs)
    at_risk = {}
    removed = 0
    for t in times:
        at_risk[t] = n - removed
        removed += sum(1 for d, _ in obs if d == t)
    cum = 0
    cif = {1: 0.0, 2: 0.0}
    for t in times:
        d_all = sum(1 for d, c in obs if d == t and c > 0)
        s_before = math.exp(cum / 1e9)
        for k in (1, 2):
            dk = sum(1 for d, c in obs if d == t and c == k)
            if dk:
                cif[k] += s_before * dk / at_risk[t]
                assert (
                    abs(got[(k, t)]["cif_q6"] - cif[k]) < 2e-6
                ), (k, t)
        if d_all:
            cum += math.floor(
                math.log(1 - d_all / at_risk[t]) * 1e9
            )
    # CIFs are monotone and their total stays below 1
    assert cif[1] + cif[2] < 1.0
    last1 = max(r["cif_q6"] for r in rows if r["cause"] == 1)
    last2 = max(r["cif_q6"] for r in rows if r["cause"] == 2)
    assert abs(last1 - cif[1]) < 2e-6 and abs(last2 - cif[2]) < 2e-6


def test_competing_risks_single_cause_matches_1_minus_km(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        competing_risks_cif,
        kaplan_meier,
    )

    # only one cause: CIF_1(t) == 1 - S_km(t)
    obs = [(1, 1), (2, 1), (2, 0), (4, 1), (5, 0), (6, 1)]
    df = spark.createDataFrame(obs, "dur int, cause int")
    cif = {
        r["t"]: r["cif_q6"]
        for r in competing_risks_cif(df, "dur", "cause").collect()
    }
    km = {
        r["duration"]: r["survival_q"]
        for r in kaplan_meier(df, "dur", "cause").collect()
    }
    for t, c in cif.items():
        assert abs(c - (1.0 - km[t])) < 5e-6, t


def test_pettitt_python_twin_and_planted_break(spark):
    from png_from_pdf_extracter_spark.functions.stats import pettitt_test
    import math

    vals = [5.0, 6.0, 5.0, 7.0, 6.0, 6.0, 15.0, 16.0, 14.0, 15.0,
            16.0, 15.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    r = pettitt_test(df, ("g",), ("o",), "v", quantize=0).collect()[0]

    # direct O(n^2) U_t with sign (ties -> 0)
    n = len(vals)

    def sgn(x):
        return (x > 0) - (x < 0)

    best_k, best_t = -1, None
    for t in range(1, n):
        u = sum(
            sgn(vals[j] - vals[i])
            for i in range(t)
            for j in range(t, n)
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), t
    assert r["n"] == n
    assert r["k_stat"] == best_k
    assert r["t_star"] == best_t
    assert r["t_star"] == 6  # the planted break
    p = 2 * math.exp(-6 * best_k**2 / (n**3 + n**2))
    assert abs(r["p_approx_q6"] - min(1.0, p)) < 2e-6
    assert r["p_approx_q6"] < 0.05


def test_pettitt_no_break_weak_k(spark):
    from png_from_pdf_extracter_spark.functions.stats import pettitt_test

    vals = _lcg_seq(60, seed=21)
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    r = pettitt_test(df, ("g",), ("o",), "v", quantize=0).collect()[0]
    assert r["p_approx_q6"] > 0.05  # nothing to find


def test_wilcoxon_signed_rank_python_twin(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        wilcoxon_signed_rank,
    )
    import math

    vals = [3.0, 5.0, 5.0, 7.0, 2.0, 9.0, 4.0, 4.0, 6.0, 8.0, 1.0]
    m0 = 4
    rows = [("g", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wilcoxon_signed_rank(
        df, "v", m0_q=m0, group_cols=("g",), quantize=0
    ).collect()[0]
    diffs = [v - m0 for v in vals if v != m0]
    absd = sorted(abs(d) for d in diffs)
    rank = {
        a: (
            sum(1 for x in absd if x < a)
            + (sum(1 for x in absd if x <= a) + 1)
        ) / 2.0
        + sum(1 for x in absd if x < a) * 0  # midrank
        for a in set(absd)
    }
    # midrank of value a = (#less) + (#eq + 1)/2
    rank = {
        a: sum(1 for x in absd if x < a)
        + (sum(1 for x in absd if x == a) + 1) / 2.0
        for a in set(absd)
    }
    wplus = sum(rank[abs(d)] for d in diffs if d > 0)
    nn = len(diffs)
    ties = {}
    for a in absd:
        ties[a] = ties.get(a, 0) + 1
    var0 = nn * (nn + 1) * (2 * nn + 1) / 24.0 - sum(
        c**3 - c for c in ties.values()
    ) / 48.0
    z = (wplus - nn * (nn + 1) / 4.0) / math.sqrt(var0)
    assert r["n_nonzero"] == nn
    assert abs(r["w_plus_q1"] - wplus) < 1e-9
    assert abs(r["z_q6"] - z) < 2e-6


def test_wilcoxon_symmetric_about_m0_near_zero(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        wilcoxon_signed_rank,
    )

    rows = [("g", float(50 + d)) for d in range(-20, 21) if d != 0]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wilcoxon_signed_rank(
        df, "v", m0_q=50, group_cols=("g",), quantize=0
    ).collect()[0]
    assert abs(r["z_q6"]) < 1e-6  # perfectly symmetric


def test_ordinal_association_python_twin(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        ordinal_association,
    )
    import math

    rows = [
        (1, 1), (1, 1), (1, 2), (2, 1), (2, 2), (2, 2), (2, 3),
        (3, 2), (3, 3), (3, 3), (3, 1), (4, 3), (4, 4), (4, 4),
    ]
    df = spark.createDataFrame(rows, "x int, y int")
    r = ordinal_association(df, "x", "y").collect()[0]

    c = d = tx = ty = 0
    n = len(rows)
    for i in range(n):
        for j in range(i + 1, n):
            dx = rows[j][0] - rows[i][0]
            dy = rows[j][1] - rows[i][1]
            if dx == 0 and dy != 0:
                tx += 1
            elif dy == 0 and dx != 0:
                ty += 1
            elif dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    assert (r["c_pairs"], r["d_pairs"]) == (c, d)
    assert abs(r["gamma_q6"] - (c - d) / (c + d)) < 2e-6
    assert abs(r["somers_yx_q6"] - (c - d) / (c + d + ty)) < 2e-6
    assert abs(r["somers_xy_q6"] - (c - d) / (c + d + tx)) < 2e-6
    taub = (c - d) / math.sqrt((c + d + tx) * (c + d + ty))
    assert abs(r["tau_b_q6"] - taub) < 2e-6
    assert r["gamma_q6"] > 0.7  # strongly concordant plant


def test_ordinal_association_reversed_negative(spark):
    from png_from_pdf_extracter_spark.functions.stats import (
        ordinal_association,
    )

    rows = [(i % 4 + 1, 4 - i % 4) for i in range(40)]
    df = spark.createDataFrame(rows, "x int, y int")
    r = ordinal_association(df, "x", "y").collect()[0]
    assert r["gamma_q6"] <= -1.0 + 2e-6  # perfect reversal
    assert r["tau_b_q6"] < -0.9


def test_msprt_gate_null_and_effect(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import msprt_gate

    # identical arms -> theta ~ 0, log Lambda < 0, p_always = 1
    rows = [(float(i % 7), i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "v double, arm int")
    r = msprt_gate(df, "v", "arm", tau=1.0, quantize=0).collect()[0]
    assert r["p_always_q6"] == 1.0
    assert r["reject"] == 0

    # strong planted effect -> tiny p, reject
    rows2 = [(float(i % 3), 0) for i in range(150)] + [
        (10.0 + float(i % 3), 1) for i in range(150)
    ]
    df2 = spark.createDataFrame(rows2, "v double, arm int")
    r2 = msprt_gate(df2, "v", "arm", tau=5.0, quantize=0).collect()[0]
    assert r2["reject"] == 1
    assert r2["p_always_q6"] < 0.001
    assert abs(r2["diff_q6"] - 10.0) < 1e-6

    # python twin of the closed form on the planted case
    import statistics

    a = [v for v, g in rows2 if g == 0]
    b = [v for v, g in rows2 if g == 1]
    theta = statistics.mean(b) - statistics.mean(a)
    vv = statistics.variance(a) / len(a) + statistics.variance(b) / len(b)
    t2 = 25.0
    log_l = 0.5 * math.log(vv / (vv + t2)) + (theta * theta * t2) / (
        (2.0 * vv) * (vv + t2)
    )
    assert abs(r2["log_lambda_q6"] - math.floor(log_l * 1e6) / 1e6) < 1e-5


def _ad2_twin(a_vals, b_vals):
    """Independent midrank A2akN (Scholz-Stephens, k=2)."""
    from collections import Counter

    fa, fb = Counter(a_vals), Counter(b_vals)
    na, nb = len(a_vals), len(b_vals)
    nn = na + nb
    cua = cub = 0
    tot = 0.0
    for z in sorted(set(a_vals) | set(b_vals)):
        la, lb = fa.get(z, 0), fb.get(z, 0)
        lj = la + lb
        ma = cua + la / 2.0
        mb = cub + lb / 2.0
        bj = cua + cub + lj / 2.0
        den = bj * (nn - bj) - nn * lj / 4.0
        if den != 0:
            tot += (lj / nn) * (
                (nn * ma - na * bj) ** 2 / (na * den)
                + (nn * mb - nb * bj) ** 2 / (nb * den)
            )
        cua += la
        cub += lb
    return (nn - 1.0) / nn * tot


def test_anderson_darling_2s_twin_and_separation(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import (
        anderson_darling_2s,
    )

    # same distribution (ties included) -> small A2; python twin exact
    a = [float(i % 10) for i in range(60)]
    b = [float(i % 10) for i in range(40)]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "v double, g string")
    r = anderson_darling_2s(df, "v", "g", "a", "b", quantize=0).collect()[0]
    exp = _ad2_twin(a, b)
    assert abs(r["a2_q6"] - math.floor(exp * 1e6) / 1e6) < 1e-5
    assert r["a2_q6"] < 1.0  # H0 holds: statistic near its ~1 null mean

    # disjoint supports -> A2 far above any critical value
    a2 = [float(i % 5) for i in range(50)]
    b2 = [100.0 + i % 5 for i in range(50)]
    rows2 = [(v, "a") for v in a2] + [(v, "b") for v in b2]
    df2 = spark.createDataFrame(rows2, "v double, g string")
    r2 = anderson_darling_2s(df2, "v", "g", "a", "b", quantize=0).collect()[
        0
    ]
    exp2 = _ad2_twin(a2, b2)
    assert abs(r2["a2_q6"] - math.floor(exp2 * 1e6) / 1e6) < 1e-4
    assert r2["a2_q6"] > 10.0

    # constant pooled sample -> null (degenerate)
    dfc = spark.createDataFrame(
        [(1.0, "a")] * 5 + [(1.0, "b")] * 5, "v double, g string"
    )
    rc = anderson_darling_2s(dfc, "v", "g", "a", "b", quantize=0).collect()[
        0
    ]
    assert rc["a2_q6"] is None


def _st_scores(n):
    """Zigzag Siegel-Tukey scores by sorted position (1-indexed)."""
    out = []
    for p in range(1, n + 1):
        q = n - p + 1
        if p < q:
            out.append(2 * p - 1 if p % 2 == 1 else 2 * p)
        elif q < p:
            out.append(2 * q if q % 2 == 1 else 2 * q - 1)
        else:
            out.append(n)
    return out


def test_siegel_tukey_scores_are_permutation():
    for n in (1, 2, 3, 4, 5, 6, 7, 10, 11, 16, 25):
        s = _st_scores(n)
        assert sorted(s) == list(range(1, n + 1)), n


def test_siegel_tukey_twin_and_direction(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import siegel_tukey

    # group a hugs the center, group b spreads wide -> a collects the
    # HIGH zigzag scores -> ST > E -> z > 0
    a = [50.0 + (i % 3) for i in range(30)]
    b = [float(10 * (i % 11)) for i in range(30)]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "v double, g string")
    r = siegel_tukey(df, "v", "g", "a", "b", quantize=0).collect()[0]
    assert r["z_q6"] is not None and r["z_q6"] > 2.0

    # python twin with tie-averaged scores
    pooled = sorted([(v, "a") for v in a] + [(v, "b") for v in b])
    n = len(pooled)
    scores = _st_scores(n)
    from collections import defaultdict

    by_val = defaultdict(list)
    for (v, g), s in zip(pooled, scores):
        by_val[v].append((g, s))
    st = 0.0
    s1 = 0
    s2 = 0.0
    for v, items in sorted(by_val.items()):
        bsum = sum(s for _, s in items)
        c = len(items)
        ca = sum(1 for g, _ in items if g == "a")
        st += ca * bsum / c
        s1 += bsum
        s2 += bsum * bsum / c
    na = nb = 30
    e = na * s1 / n
    var = na * nb * (n * s2 - s1 * s1) / (n * n * (n - 1.0))
    z = (st - e) / math.sqrt(var)
    assert abs(r["st_q6"] - math.floor(st * 1e6) / 1e6) < 1e-5
    assert abs(r["z_q6"] - math.floor(z * 1e6) / 1e6) < 1e-5


def test_overdispersion_index_poisson_vs_clumped(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import (
        overdispersion_index,
    )

    # near-constant counts -> VMR << 1, z negative; clumped -> VMR >> 1
    rows = [("flat", 5)] * 50 + [("flat", 6)] * 50
    rows += [("clump", 0)] * 90 + [("clump", 50)] * 10
    df = spark.createDataFrame(rows, "g string, c long")
    out = {
        r["g"]: r
        for r in overdispersion_index(df, "c", ("g",)).collect()
    }
    f = out["flat"]
    assert abs(f["mean_q6"] - 5.5) < 1e-6
    assert f["vmr_q6"] < 0.1 and f["z_q6"] < -5.0
    c = out["clump"]
    assert c["vmr_q6"] > 20.0 and c["z_q6"] > 10.0
    # python twin on the clumped group
    vals = [0] * 90 + [50] * 10
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    vmr = var / mean
    z = ((n - 1) * vmr - (n - 1)) / math.sqrt(2 * (n - 1))
    assert abs(c["vmr_q6"] - math.floor(vmr * 1e6) / 1e6) < 1e-4
    assert abs(c["z_q6"] - math.floor(z * 1e6) / 1e6) < 1e-4

    # n = 1 group: stats null
    one = spark.createDataFrame([("solo", 3)], "g string, c long")
    r1 = overdispersion_index(one, "c", ("g",)).collect()[0]
    assert r1["vmr_q6"] is None and r1["z_q6"] is None


def test_poisson_rate_ratio_null_and_planted(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import (
        poisson_rate_ratio,
    )

    # equal rates (5 events / 10 days per user in both arms)
    rows = [(5, 10, i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "x long, t long, g int")
    r = poisson_rate_ratio(df, "x", "t", "g").collect()[0]
    assert abs(r["rr_q6"] - 1.0) < 1e-6
    assert abs(r["z_q6"]) < 1e-6

    # arm 1 fires at double the rate
    rows2 = [(5, 10, 0)] * 60 + [(10, 10, 1)] * 60
    df2 = spark.createDataFrame(rows2, "x long, t long, g int")
    r2 = poisson_rate_ratio(df2, "x", "t", "g").collect()[0]
    # arm A = min group = 0 -> RR = rate_a / rate_b = 0.5
    assert abs(r2["rr_q6"] - 0.5) < 1e-6
    xa, xb = 300, 600
    z = math.log(0.5) / math.sqrt(1 / xa + 1 / xb)
    assert abs(r2["z_q6"] - math.floor(z * 1e6) / 1e6) < 2e-6

    # zero-event arm -> null stats
    rows3 = [(0, 10, 0)] * 5 + [(3, 10, 1)] * 5
    df3 = spark.createDataFrame(rows3, "x long, t long, g int")
    r3 = poisson_rate_ratio(df3, "x", "t", "g").collect()[0]
    assert r3["rr_q6"] is None and r3["z_q6"] is None


def test_two_proportion_diff_null_planted_and_extreme(spark):
    import math

    from png_from_pdf_extracter_spark.functions.stats import (
        two_proportion_diff,
    )

    # equal proportions -> diff 0, CI straddles 0
    rows = [(i % 5 == 0, i % 2) for i in range(200)]
    df = spark.createDataFrame(
        [(int(h), g) for h, g in rows], "hi int, g int"
    )
    r = two_proportion_diff(df, "hi", "g").collect()[0]
    assert abs(r["diff_q6"]) < 1e-6
    assert r["ci_lo_q6"] < 0 < r["ci_hi_q6"]

    # planted gap 0.6 vs 0.2 -> z big, CI excludes 0; python twin
    rows2 = [(1, 0)] * 60 + [(0, 0)] * 40 + [(1, 1)] * 20 + [(0, 1)] * 80
    df2 = spark.createDataFrame(rows2, "hi int, g int")
    r2 = two_proportion_diff(df2, "hi", "g").collect()[0]
    assert abs(r2["diff_q6"] - 0.4) < 2e-6
    pp = 80 / 200
    se = math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    z = 0.4 / se
    assert abs(r2["z_q6"] - math.floor(z * 1e6) / 1e6) < 2e-6
    assert r2["ci_lo_q6"] > 0

    # extreme arm at 0%: Newcombe bounds stay finite and ordered
    rows3 = [(0, 0)] * 50 + [(1, 1)] * 30 + [(0, 1)] * 20
    df3 = spark.createDataFrame(rows3, "hi int, g int")
    r3 = two_proportion_diff(df3, "hi", "g").collect()[0]
    assert r3["ci_lo_q6"] < r3["diff_q6"] < r3["ci_hi_q6"]
    assert r3["ci_hi_q6"] < 0  # arm A (0%) minus arm B (60%) is negative
