"""PSI distribution-drift detection (functions/drift.py)."""

import pytest

from png_from_pdf_extracter_spark.functions.drift import psi_drift


def _frame(spark, vals, group="g"):
    return spark.createDataFrame(
        [(group, float(v)) for v in vals], ["grp", "value"]
    )


def test_identical_snapshots_score_zero(spark):
    vals = list(range(100))
    out = psi_drift(
        _frame(spark, vals), _frame(spark, vals), "value", "grp"
    ).collect()[0]
    assert out["psi"] == 0.0
    assert out["n_base"] == 100 and out["n_cur"] == 100


def test_shifted_distribution_flags_drift(spark):
    base = _frame(spark, range(100))
    cur = _frame(spark, range(80, 180))  # heavy right shift
    out = psi_drift(base, cur, "value", "grp").collect()[0]
    assert out["psi"] > 0.25  # the standard "shifted" threshold


def test_mild_noise_stays_stable(spark):
    base = _frame(spark, range(100))
    cur = _frame(spark, list(range(98)) + [105, 110])  # 2% tail perturbation
    out = psi_drift(base, cur, "value", "grp").collect()[0]
    assert out["psi"] < 0.1


def test_groups_are_independent(spark):
    base = _frame(spark, range(100), "a").union(
        _frame(spark, range(100), "b")
    )
    cur = _frame(spark, range(100), "a").union(
        _frame(spark, range(80, 180), "b")
    )
    out = {r["grp"]: r["psi"] for r in
           psi_drift(base, cur, "value", "grp").collect()}
    assert out["a"] == 0.0
    assert out["b"] > 0.25


def test_bucket_validation(spark):
    with pytest.raises(ValueError):
        psi_drift(_frame(spark, [1]), _frame(spark, [1]), "value", "grp",
                  n_buckets=1)
