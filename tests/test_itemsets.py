"""cooccur_lift: pairwise market-basket association statistics.

Brute-force pins on tiny baskets, the independence/lift identity, the
oversized-basket guard, and validation probes.
"""

import pytest

from png_from_pdf_extracter_spark.functions.itemsets import cooccur_lift


def _rows(spark, baskets):
    data = [(bk, it) for bk, its in baskets.items() for it in its]
    return spark.createDataFrame(data, "bk long, it string")


def test_cooccur_counts_bruteforce(spark):
    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b"],
        3: ["a"],
        4: ["b", "c"],
    }
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccur_lift(_rows(spark, baskets), "bk", "it").collect()
    }
    ab = out[("a", "b")]
    assert ab["n_ab"] == 2 and ab["n_a"] == 3 and ab["n_b"] == 3
    assert ab["n_baskets"] == 4
    assert ab["support_ppm"] == 500000
    assert ab["confidence_ppm"] == 666666  # floor(2/3 * 1e6)
    assert ab["lift_ppm"] == 888888  # floor(4*2/(3*3) * 1e6)
    assert ("b", "c") in out and ("a", "c") in out
    assert len(out) == 3


def test_cooccur_duplicate_rows_collapse(spark):
    # the same item twice in one basket counts once
    df = _rows(spark, {1: ["a", "a", "b"], 2: ["a", "b"]})
    out = cooccur_lift(df, "bk", "it").collect()
    assert len(out) == 1
    assert out[0]["n_ab"] == 2 and out[0]["n_a"] == 2


def test_cooccur_independent_items_lift_near_one(spark):
    # a in every basket, b in every basket -> lift exactly 1
    baskets = {i: ["a", "b"] for i in range(10)}
    r = cooccur_lift(_rows(spark, baskets), "bk", "it").collect()[0]
    assert r["lift_ppm"] == 1000000


def test_cooccur_max_basket_guard_drops_hot_basket(spark):
    baskets = {1: [f"i{k}" for k in range(50)], 2: ["i0", "i1"]}
    out = cooccur_lift(
        _rows(spark, baskets), "bk", "it", max_basket_items=10
    ).collect()
    assert len(out) == 1  # only basket 2 survives
    assert out[0]["n_baskets"] == 1


def test_cooccur_min_pair_count_and_validation(spark):
    df = _rows(spark, {1: ["a", "b"], 2: ["a", "c"]})
    out = cooccur_lift(df, "bk", "it", min_pair_count=2).collect()
    assert out == []
    with pytest.raises(ValueError):
        cooccur_lift(df, "bk", "it", min_pair_count=0)
    with pytest.raises(ValueError):
        cooccur_lift(df, "bk", "it", max_basket_items=1)
