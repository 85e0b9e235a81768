"""Sketch profiling accuracy: HLL++ cardinality within its rsd bound and
approx percentiles within rank tolerance of the exact twin."""

import importlib.util


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


SF_DIR = "/root/testdata/sf0.01"


def test_sketch_tracks_exact(spark):
    m = _entry()
    exact = {
        r["event_type"]: r for r in m.queries()["q_profile"](spark, SF_DIR).collect()
    }
    sk = {
        r["event_type"]: r
        for r in m.queries()["q_profile_sketch"](spark, SF_DIR).collect()
    }
    assert set(exact) == set(sk)
    for et, ex in exact.items():
        s = sk[et]
        # HLL++ at rsd=0.02: allow 3 sigma + integer slack
        assert abs(s["approx_users"] - ex["n_users"]) <= max(
            3, 0.06 * ex["n_users"]
        ), et
        # approx_percentile with 10k accuracy on uniform-ish values:
        # within 5% of the exact quantile's value range
        for a, b in (("p50_approx", "p50"), ("p95_approx", "p95")):
            assert abs(s[a] - ex[b]) <= 0.05 * max(abs(ex[b]), 1.0), (et, a)
