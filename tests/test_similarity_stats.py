"""Embedding summary statistics: distributed covariance + PCA whitening.

embedding_covariance is the one-pass partial-sufficient-statistics
pattern (per-batch BLAS gram + sums, dim^2-key merge); pca_whiten
consumes it driver-side (bounded dim^2 state) and ships the projection
back as a folded constant. Reference analog: none — these are the
training-data-pipeline statistics the brief adds on top of the
reference surface.
"""
import numpy as np
from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.functions import similarity


def _corpus(spark, n=200, dim=6, seed=3, n_null=0):
    rng = np.random.default_rng(seed)
    # correlated dims so the covariance is far from diagonal
    a = rng.standard_normal((n, dim))
    a[:, 1] = 0.7 * a[:, 0] + 0.3 * a[:, 1]
    rows = [(i, [float(x) for x in a[i]]) for i in range(n)]
    rows += [(n + j, None) for j in range(n_null)]
    return (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ),
        a,
    )


def test_embedding_covariance_matches_numpy(spark):
    df, a = _corpus(spark)
    got = {
        (r["d1"], r["d2"]): r["cov"]
        for r in similarity.embedding_covariance(df).collect()
    }
    want = np.cov(a, rowvar=False, ddof=1)
    dim = a.shape[1]
    assert len(got) == dim * (dim + 1) // 2
    for i in range(dim):
        for j in range(i, dim):
            assert abs(got[(i, j)] - want[i, j]) < 1e-9, (i, j)


def test_embedding_covariance_skips_null_vectors(spark):
    df, a = _corpus(spark, n=50, n_null=7)
    got = {
        (r["d1"], r["d2"]): r["cov"]
        for r in similarity.embedding_covariance(df).collect()
    }
    want = np.cov(a, rowvar=False, ddof=1)
    for (i, j), v in got.items():
        assert abs(v - want[i, j]) < 1e-9


def test_pca_whiten_identity_covariance_and_determinism(spark):
    df, a = _corpus(spark, n=300, dim=5)
    w = similarity.pca_whiten(df)
    mat = np.asarray(
        [r["whitened"] for r in w.orderBy("vec_id").collect()]
    )
    c = np.cov(mat, rowvar=False, ddof=1)
    assert np.allclose(c, np.eye(5), atol=1e-6), c
    # deterministic end-to-end (md5-free: eigh on an exact covariance)
    mat2 = np.asarray(
        [
            r["whitened"]
            for r in similarity.pca_whiten(df).orderBy("vec_id").collect()
        ]
    )
    assert np.array_equal(mat, mat2)


def test_pca_whiten_clamps_degenerate_dims(spark):
    # a constant dim has zero variance — whitening must not divide by 0;
    # the clamped component projects to ~0 instead of exploding
    rows = [
        (i, [float(i % 7), 5.0, float((i * 3) % 5)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mat = np.asarray(
        [r["whitened"] for r in similarity.pca_whiten(df).collect()]
    )
    assert np.all(np.isfinite(mat))
    variances = mat.var(axis=0, ddof=1)
    # two live dims whiten to variance 1; the degenerate one stays ~0
    assert sorted(v > 0.5 for v in variances) == [False, True, True]


def test_pca_whiten_empty_corpus_raises(spark):
    import pytest

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        similarity.pca_whiten(df)
