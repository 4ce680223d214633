"""Scalar quantization (operators/quantize.py): error bound by
construction, cosine top-k recall, frozen-stats train/apply split,
compact code packing, degenerate dims."""

from __future__ import annotations

import numpy as np

from tp_integ_data_pipeline_spark.operators.quantize import (
    codes_to_array,
    dim_stats,
    quantize_codes,
    reconstruction_report,
)


def _toy(spark, n=120, d=16, seed=11, parts=8):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)) * rng.uniform(0.5, 4.0, size=d)
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(
        parts
    )
    return df, x


def test_error_bound_and_report(spark):
    df, x = _toy(spark)
    ex = quantize_codes(df, "embedding", "vec_id", levels=255)
    rep = reconstruction_report(ex).toPandas().set_index("dim").sort_index()
    # nearest-level rounding: per-dim max error <= range / levels / 2
    half_step = (rep["cmax"] - rep["cmin"]) / 255.0 / 2.0
    assert (rep["max_abs_err"] <= half_step + 1e-9).all()
    assert (rep["avg_abs_err"] <= rep["max_abs_err"] + 1e-12).all()
    # codes span the range: min value -> 0, max value -> levels
    mn = ex.toPandas()
    assert mn["code"].min() == 0
    assert mn["code"].max() == 255


def test_cosine_topk_recall(spark):
    df, x = _toy(spark, n=150, d=24, seed=3)
    packed = codes_to_array(quantize_codes(df, "embedding", "vec_id")).toPandas()
    st = dim_stats(df, "embedding").toPandas().set_index("dim").sort_index()
    scale = (st["cmax"] - st["cmin"]).to_numpy() / 255.0
    recon = np.zeros_like(x)
    for _, r in packed.iterrows():
        recon[int(r["id"])] = st["cmin"].to_numpy() + np.array(r["codes"]) * scale

    def topk(m, q, k=10):
        sims = (m @ m[q]) / (np.linalg.norm(m, axis=1) * np.linalg.norm(m[q]) + 1e-12)
        sims[q] = -np.inf
        return set(np.argsort(-sims)[:k])

    recalls = [
        len(topk(x, q) & topk(recon, q)) / 10.0 for q in range(0, len(x), 15)
    ]
    assert np.mean(recalls) >= 0.85, recalls


def test_frozen_stats_apply_to_increment(spark):
    """Quantizer trained on a snapshot applies unchanged to later
    batches: same value -> same code, even when the increment widens
    the data range (codes clamp is the caller's policy; here the
    increment stays in range)."""
    df, x = _toy(spark, n=80, d=8, seed=5)
    st = dim_stats(df, "embedding")
    base = quantize_codes(df, "embedding", "vec_id", stats=st).toPandas()
    # re-quantize a subset as an "increment" with the frozen stats
    inc = df.filter("vec_id < 20")
    got = quantize_codes(inc, "embedding", "vec_id", stats=st).toPandas()
    merged = got.merge(base, on=["id", "dim"], suffixes=("_inc", "_base"))
    assert (merged["code_inc"] == merged["code_base"]).all()


def test_codes_to_array_order_and_degenerate_dim(spark):
    rows = [(0, [1.0, 5.0, 2.0]), (1, [3.0, 5.0, 0.0]), (2, [2.0, 5.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ex = quantize_codes(df, "embedding", "vec_id", levels=255)
    packed = codes_to_array(ex).toPandas().set_index("id").sort_index()
    assert all(len(c) == 3 for c in packed["codes"])
    # dim 1 is constant -> degenerate -> code 0 everywhere, zero error
    d1 = ex.filter("dim = 1").toPandas()
    assert (d1["code"] == 0).all()
    assert (d1["abs_err"] == 0.0).all()
    # dim 0 values 1,2,3 -> codes 0, 127|128, 255 in position order
    codes0 = [c[0] for c in packed["codes"]]
    assert codes0[0] == 0 and codes0[1] == 255 and codes0[2] in (127, 128)


def test_frozen_stats_out_of_range_clamps(spark):
    """Apply path: increment values outside the trained [cmin, cmax]
    saturate to 0 / levels (int8 contract) instead of escaping the
    code range."""
    base = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    st = dim_stats(base, "embedding")
    inc = spark.createDataFrame(
        [(2, [2.0, -1.0])], "vec_id long, embedding array<double>"
    )
    got = (
        quantize_codes(inc, "embedding", "vec_id", levels=255, stats=st)
        .orderBy("dim")
        .collect()
    )
    assert [r["code"] for r in got] == [255, 0]


def test_frozen_stats_dim_mismatch_fails_loudly(spark):
    """Apply path: an increment with MORE dimensions than the trained
    stats must raise (assert_true in the left-join filter), never
    silently drop the unknown dims — the round-4 ADVICE trap."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    base = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    st = dim_stats(base, "embedding")
    wide = spark.createDataFrame(
        [(2, [0.5, 0.5, 0.5])], "vec_id long, embedding array<double>"
    )
    with pytest.raises((SparkRuntimeException, Exception), match="absent from frozen stats"):
        quantize_codes(wide, "embedding", "vec_id", stats=st).collect()
    # matching-width increments still pass through the left-join path
    ok = spark.createDataFrame([(3, [0.25, 0.75])], "vec_id long, embedding array<double>")
    assert quantize_codes(ok, "embedding", "vec_id", stats=st).count() == 2
