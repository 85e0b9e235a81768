"""Deequ-style one-pass expectation suite (functions/expectations.py)."""

import pytest

from png_from_pdf_extracter_spark.functions.expectations import (
    Check,
    expectation_report,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", "en", 100),
            (2, "beta", "en", 250),
            (3, None, "xx", 50),
            (3, "gamma", None, 7),
        ],
        ["id", "text", "lang", "n"],
    )


def test_report_values_and_verdicts(spark, df):
    rep = {
        (r["check"], r["col_name"]): r
        for r in expectation_report(
            df,
            [
                Check("non_empty"),
                Check("complete", "text"),
                Check("unique", "id"),
                Check("min_ge", "n", value=0),
                Check("max_le", "n", value=200),
                Check("in_set", "lang", values=("en", "de")),
                Check("mean_between", "n", value=50, value2=150),
            ],
        ).collect()
    }
    assert rep[("non_empty", "")]["observed"] == 4.0
    assert rep[("non_empty", "")]["passed"] is True
    assert rep[("complete", "text")]["observed"] == 1.0  # one NULL
    assert rep[("complete", "text")]["passed"] is False
    assert rep[("unique", "id")]["observed"] == 1.0  # id=3 twice
    assert rep[("unique", "id")]["passed"] is False
    assert rep[("min_ge", "n")]["observed"] == 7.0
    assert rep[("min_ge", "n")]["passed"] is True
    assert rep[("max_le", "n")]["observed"] == 250.0
    assert rep[("max_le", "n")]["passed"] is False
    # 'xx' violates, NULL lang does NOT count as an in_set violation
    assert rep[("in_set", "lang")]["observed"] == 1.0
    assert rep[("in_set", "lang")]["passed"] is False
    assert rep[("mean_between", "n")]["observed"] == pytest.approx(101.75)
    assert rep[("mean_between", "n")]["passed"] is True


def test_all_checks_are_one_aggregate_pass(spark, df):
    """The Deequ contract: N checks compile to ONE aggregation over one
    scan — the optimized plan must contain exactly one Aggregate."""
    out = expectation_report(
        df,
        [
            Check("complete", "text"),
            Check("unique", "id"),
            Check("min_ge", "n", value=0),
            Check("mean_between", "n", value=0, value2=1e9),
        ],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_approx_unique_path(spark, df):
    rep = expectation_report(
        df, [Check("unique", "id")], approx_unique=True
    ).collect()[0]
    # HLL++ at this cardinality is exact: one duplicate
    assert rep["observed"] == 1.0
    assert rep["passed"] is False


def test_check_validation():
    with pytest.raises(ValueError):
        Check("bogus", "x")
    with pytest.raises(ValueError):
        Check("complete")
    with pytest.raises(ValueError):
        Check("in_set", "lang")
    with pytest.raises(ValueError):
        expectation_report(None, [])
