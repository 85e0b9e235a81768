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
