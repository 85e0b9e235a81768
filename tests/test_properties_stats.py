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


# ---- batch 2: spearman / ewma / autocorr / kmv / kneser-ney ----

import hashlib

from png_from_pdf_extracter_spark.functions.lm import kn_bigram_perplexity
from png_from_pdf_extracter_spark.functions.sketch import (
    kmv_build,
    kmv_estimate,
)
from png_from_pdf_extracter_spark.functions.stats import (
    autocorr_lag1,
    spearman_corr,
)
from png_from_pdf_extracter_spark.operators.temporal import ewma


def _avg_ranks(vals):
    """Textbook average ranks (1-based) with ties sharing the mean of
    their rank range; returned doubled so everything stays integer."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    r2 = [0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        # ranks i+1..j share mean (i+1+j)/2 -> doubled = i+1+j
        for t in range(i, j):
            r2[order[t]] = i + 1 + j
        i = j
    return r2


@_settings
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=3,
        max_size=25,
    )
)
def test_spearman_matches_bruteforce_ranks(spark, pairs):
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pairs], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    xs = [x for x, _ in pairs]
    ys = [y for _, y in pairs]
    r2x, r2y = _avg_ranks(xs), _avg_ranks(ys)
    assert r["sx2"] == sum(r2x) and r["sy2"] == sum(r2y)
    n = len(pairs)
    num = n * sum(a * b for a, b in zip(r2x, r2y)) - sum(r2x) * sum(r2y)
    dx = n * sum(a * a for a in r2x) - sum(r2x) ** 2
    dy = n * sum(b * b for b in r2y) - sum(r2y) ** 2
    if dx > 0 and dy > 0:
        rho = num / (math.sqrt(dx) * math.sqrt(dy))
        assert r["rho"] == math.floor(rho * 1e6) / 1e6
    else:
        assert r["rho"] is None


@_settings
@given(
    vals=st.lists(
        st.floats(
            min_value=-100,
            max_value=100,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_ewma_bit_exact_vs_python_fold(spark, vals):
    """The distributed fold must equal the literal Python recurrence
    BIT-FOR-BIT (same doubles, same op order, dyadic alpha)."""
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "g string, i long, v double",
    )
    r = ewma(df, ("g",), ("i",), "v").collect()[0]
    s = vals[0]
    for x in vals[1:]:
        s = s * 0.75 + x * 0.25
    assert r["ewma"] == math.floor(s * 1e6) / 1e6


@_settings
@given(vals=st.lists(st.integers(0, 9), min_size=2, max_size=25))
def test_autocorr_matches_bruteforce(spark, vals):
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "g string, i long, v double",
    )
    r = autocorr_lag1(df, ("g",), ("i",), "v", quantize=0).collect()[0]
    xs, ys = vals[:-1], vals[1:]
    n = len(xs)
    assert (r["sx"], r["sy"]) == (sum(xs), sum(ys))
    num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    dx = n * sum(a * a for a in xs) - sum(xs) ** 2
    dy = n * sum(b * b for b in ys) - sum(ys) ** 2
    if dx > 0 and dy > 0:
        ref = num / (math.sqrt(dx) * math.sqrt(dy))
        assert r["r1"] == math.floor(ref * 1e6) / 1e6
    else:
        assert r["r1"] is None


@_settings
@given(
    items=st.lists(
        st.integers(0, 400), min_size=1, max_size=120, unique=True
    ),
    k=st.sampled_from([4, 16, 64]),
)
def test_kmv_matches_python_md5_reference(spark, items, k):
    """The sketch state must be exactly the k smallest 60-bit md5
    prefixes hashlib computes, and the estimate the same formula."""
    df = spark.createDataFrame(
        [("g", str(i)) for i in items], "g string, item string"
    )
    sk = kmv_build(df, "item", ("g",), k=k)
    got = sorted(r["h"] for r in sk.collect())
    ref = sorted(
        int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        for i in items
    )[:k]
    assert got == ref
    est = kmv_estimate(sk, ("g",), k=k).collect()[0]
    if len(items) < k:
        assert est["est_distinct"] == len(items)
    else:
        assert est["est_distinct"] == math.floor(
            (k - 1) * 2.0**60 / ref[k - 1]
        )


@_settings
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=8),
        min_size=1,
        max_size=10,
    )
)
def test_kneser_ney_matches_python_model(spark, docs):
    """Per-doc KN avg_nll must match a dict-built Python model of the
    same corpus at the emitted 3dp rounding."""
    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["avg_nll"]
        for r in kn_bigram_perplexity(df).collect()
    }
    # python reference
    from collections import Counter, defaultdict

    bg = Counter()
    for d in docs:
        for w1, w2 in zip(d, d[1:]):
            bg[(w1, w2)] += 1
    c1, n1fwd, n1back = Counter(), Counter(), Counter()
    for (w1, w2), c in bg.items():
        c1[w1] += c
        n1fwd[w1] += 1
        n1back[w2] += 1
    ntypes = len(bg)
    ref = {}
    for i, d in enumerate(docs):
        if len(d) < 2:
            continue
        nll = []
        for w1, w2 in zip(d, d[1:]):
            p = max(bg[(w1, w2)] - 0.75, 0.0) / c1[w1] + (
                0.75 * n1fwd[w1] / c1[w1]
            ) * (n1back[w2] / ntypes)
            nll.append(-math.log(p))
        ref[i] = round(sum(nll) / len(nll), 3)
    assert set(out) == set(ref)
    for i in ref:
        assert abs(out[i] - ref[i]) <= 0.001  # 3dp emit, float avg order
