"""Embedding moment statistics: distributed covariance == numpy,
PCA/whitening spectral properties, model-as-broadcast transform."""

from __future__ import annotations

import numpy as np
import pytest

from tp_integ_data_pipeline_spark.operators.embed_stats import (
    covariance_matrix,
    fit_pca,
    partial_moments,
    transform_pca,
)


def _toy(spark, n=60, d=5, seed=7, parts=8):
    rng = np.random.default_rng(seed)
    # anisotropic: correlated dims so the spectrum is non-trivial
    a = rng.normal(size=(d, d))
    x = rng.normal(size=(n, d)) @ a + rng.normal(size=d) * 3.0
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(
        parts
    )
    return df, x


def test_covariance_matches_numpy(spark):
    df, x = _toy(spark)
    tri = covariance_matrix(df, "embedding").toPandas()
    d = x.shape[1]
    got = np.zeros((d, d))
    got[tri["i"], tri["j"]] = tri["cov"]
    got[tri["j"], tri["i"]] = tri["cov"]
    want = np.cov(x, rowvar=False, bias=True)  # population
    assert np.allclose(got, want, atol=1e-9)
    # upper triangle only: d*(d+1)/2 rows
    assert len(tri) == d * (d + 1) // 2


def test_covariance_independent_of_partitioning(spark):
    df1, _ = _toy(spark, parts=1)
    df8, _ = _toy(spark, parts=8)
    a = covariance_matrix(df1, "embedding").toPandas().sort_values(["i", "j"])
    b = covariance_matrix(df8, "embedding").toPandas().sort_values(["i", "j"])
    assert np.allclose(a["cov"].to_numpy(), b["cov"].to_numpy(), atol=1e-9)


def test_covariance_deterministic_mode_bit_identical(spark):
    """id_col mode must be BIT-identical (==, not allclose) under any
    upstream partitioning AND any Arrow batch size — the q126 driver-
    hash contract: a ROUND(,6) boundary cell may never flip with the
    environment."""
    df1, _ = _toy(spark, n=300, d=6, parts=1)
    df7, _ = _toy(spark, n=300, d=6, parts=7)
    df32, _ = _toy(spark, n=300, d=6, parts=32)
    base = covariance_matrix(df1, "embedding", id_col="vec_id").toPandas()
    base = base.sort_values(["i", "j"])["cov"].to_numpy()
    for other in (df7, df32):
        got = covariance_matrix(other, "embedding", id_col="vec_id").toPandas()
        got = got.sort_values(["i", "j"])["cov"].to_numpy()
        assert np.array_equal(base, got)  # bit-exact, not allclose
    # and under a different Arrow batch boundary within partitions
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
        got = covariance_matrix(df7, "embedding", id_col="vec_id").toPandas()
        got = got.sort_values(["i", "j"])["cov"].to_numpy()
        assert np.array_equal(base, got)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    # deterministic mode still agrees with numpy
    _, x = _toy(spark, n=300, d=6, parts=1)
    d = x.shape[1]
    tri = covariance_matrix(df1, "embedding", id_col="vec_id").toPandas()
    got = np.zeros((d, d))
    got[tri["i"], tri["j"]] = tri["cov"]
    got[tri["j"], tri["i"]] = tri["cov"]
    assert np.allclose(got, np.cov(x, rowvar=False, bias=True), atol=1e-9)


def test_fit_pca_deterministic_mode_stable(spark):
    """fit_pca(id_col=...) returns bit-identical models across
    partitionings (q127's run-stability)."""
    df1, _ = _toy(spark, n=150, d=5, parts=1, seed=13)
    df9, _ = _toy(spark, n=150, d=5, parts=9, seed=13)
    m1 = fit_pca(df1, "embedding", id_col="vec_id")
    m9 = fit_pca(df9, "embedding", id_col="vec_id")
    assert np.array_equal(m1["mean"], m9["mean"])
    assert np.array_equal(m1["components"], m9["components"])
    assert np.array_equal(m1["eigenvalues"], m9["eigenvalues"])


def test_whitening_gives_identity_covariance(spark):
    df, x = _toy(spark, n=200, d=6)
    model = fit_pca(df, "embedding", k=None, eps=0.0)
    # eigenvalues descending and match numpy spectrum
    ev = model["eigenvalues"]
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    want = np.sort(np.linalg.eigvalsh(np.cov(x, rowvar=False, bias=True)))[::-1]
    assert np.allclose(ev, want, atol=1e-9)
    proj = transform_pca(df, model, "embedding", out_col="proj", whiten=True)
    p = np.stack(proj.toPandas()["proj"].to_numpy())
    cov = np.cov(p, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(x.shape[1]), atol=1e-7)
    # means removed
    assert np.allclose(p.mean(axis=0), 0.0, atol=1e-9)


def test_pca_projection_matches_numpy(spark):
    df, x = _toy(spark, n=80, d=4, seed=3)
    model = fit_pca(df, "embedding", k=2)
    proj = transform_pca(df, model, "embedding", out_col="proj").toPandas()
    proj = proj.sort_values("vec_id")
    got = np.stack(proj["proj"].to_numpy())
    want = (x - x.mean(axis=0)) @ model["components"]
    assert got.shape == (80, 2)
    assert np.allclose(got, want, atol=1e-9)
    # keep_cols carried through
    assert list(proj.columns) == ["vec_id", "proj"]


def test_fit_deterministic_sign_convention(spark):
    df, _ = _toy(spark, seed=11)
    m1 = fit_pca(df, "embedding")
    m2 = fit_pca(df, "embedding")
    assert np.array_equal(m1["components"], m2["components"])
    # each component's largest-|coord| entry is positive
    c = m1["components"]
    idx = np.abs(c).argmax(axis=0)
    assert (c[idx, np.arange(c.shape[1])] > 0).all()


def test_partial_moments_empty_and_sparse_partitions(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert partial_moments(empty, "embedding").count() == 0
    with pytest.raises(ValueError):
        fit_pca(empty, "embedding")
    # 2 rows across 16 partitions: most partitions contribute nothing
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 5.0])], "vec_id long, embedding array<double>"
    ).repartition(16)
    tri = covariance_matrix(df, "embedding").toPandas()
    got = np.zeros((2, 2))
    got[tri["i"], tri["j"]] = tri["cov"]
    got[tri["j"], tri["i"]] = tri["cov"]
    assert np.allclose(got, np.cov([[1.0, 2.0], [3.0, 5.0]], rowvar=False, bias=True))
