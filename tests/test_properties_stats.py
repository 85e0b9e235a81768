"""Property-based tests (hypothesis) for the round-3 statistics
operators: each distributed estimator is pinned against a naive
brute-force Python reference on arbitrary small inputs — randomized +
shrinking coverage on top of the hand fixtures in test_stats.py /
test_temporal.py. Integer payloads keep every comparison exact.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from png_from_pdf_extracter_spark.functions.stats import (
    changepoint_single,
    mann_whitney_u,
    rolling_median,
    running_distinct,
)
from png_from_pdf_extracter_spark.operators.temporal import interval_union

_settings = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# small integer value pools force ties, the interesting case everywhere
_vals = st.lists(
    st.integers(min_value=0, max_value=8), min_size=1, max_size=24
)


@_settings
@given(a=_vals, b=_vals)
def test_mann_whitney_matches_bruteforce(spark, a, b):
    """2U_a must equal the literal pairwise count: 2*#(a>b) + #(a==b),
    for ANY two samples (the definition, computed O(n²) in Python)."""
    rows = [("A", float(v)) for v in a] + [("B", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "v", "g", "A", "B").collect()[0]
    u2_ref = sum(
        2 if x > y else (1 if x == y else 0) for x in a for y in b
    )
    assert r["u2_a"] == u2_ref
    assert r["u2_a"] + r["u2_b"] == 2 * len(a) * len(b)


@_settings
@given(vals=st.lists(st.integers(0, 50), min_size=4, max_size=20))
def test_changepoint_matches_bruteforce(spark, vals):
    """k_star must be the argmin of two-segment SSE with smallest-k
    tie-break, for ANY sequence — checked against the O(n²) scan."""
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "g string, i long, v double",
    )
    r = changepoint_single(df, ("g",), ("i",), "v", quantize=0).collect()[0]
    n = len(vals)

    def sse(seg):
        m = sum(seg) / len(seg)
        return sum((x - m) ** 2 for x in seg)

    best_k, best = None, None
    for k in range(2, n - 1):
        s = sse(vals[:k]) + sse(vals[k:])
        if best is None or s < best - 1e-9:
            best_k, best = k, s
    assert r["k_star"] == best_k


@_settings
@given(vals=st.lists(st.integers(0, 9), min_size=1, max_size=30))
def test_rolling_median_matches_bruteforce(spark, vals):
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "g string, i long, v double",
    )
    out = (
        rolling_median(df, ("g",), ("i",), "v", window_rows=4, quantize=0)
        .orderBy("i")
        .collect()
    )
    for i, r in enumerate(out):
        frame = sorted(vals[max(0, i - 3) : i + 1])
        assert r["med_q"] == frame[math.ceil(len(frame) / 2) - 1]


@_settings
@given(vals=st.lists(st.sampled_from("abcd"), min_size=1, max_size=30))
def test_running_distinct_matches_bruteforce(spark, vals):
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)],
        "g string, i long, v string",
    )
    out = (
        running_distinct(df, ("g",), ("i",), "v").orderBy("i").collect()
    )
    for i, r in enumerate(out):
        assert r["n_distinct"] == len(set(vals[: i + 1]))


@_settings
@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 20)),
        min_size=1,
        max_size=20,
    )
)
def test_interval_union_matches_bruteforce(spark, ivs):
    """covered_us must equal the length of the literal set-union of the
    integer second-ranges, for ANY interval multiset."""
    df = spark.createDataFrame(
        [
            (
                "k",
                f"2026-01-01 00:{s // 60:02d}:{s % 60:02d}",
                f"2026-01-01 00:{(s + d) // 60:02d}:{(s + d) % 60:02d}",
            )
            for s, d in ivs
        ],
        "g string, start_ts string, end_ts string",
    ).selectExpr(
        "g",
        "cast(start_ts as timestamp) as start_ts",
        "cast(end_ts as timestamp) as end_ts",
    )
    r = interval_union(df, ("g",), "start_ts", "end_ts").collect()[0]
    covered = set()
    for s, d in ivs:
        covered.update(range(s, s + d))
    assert r["covered_us"] == len(covered) * 1_000_000
    assert r["n_intervals"] == len(ivs)
