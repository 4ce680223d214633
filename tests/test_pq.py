"""Product quantization (operators/pq.py): code shape/determinism,
ADC vs true distance, IVF-PQ recall vs brute force, exhaustive-probe
== exact when shortlist covers the corpus."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.pq import (
    ivf_pq_topk,
    pq_encode,
    pq_fit,
)
from tp_integ_data_pipeline_spark.operators.similarity import ivf_fit


def _toy(spark, n=160, d=16, n_clusters=8, seed=9, parts=8):
    """Clustered vectors so both KMeans fits find real structure."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=3.0, size=(n_clusters, d))
    x = centers[rng.integers(0, n_clusters, n)] + rng.normal(scale=0.4, size=(n, d))
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(
        parts
    )
    return df, x


def test_codes_shape_and_determinism(spark):
    df, x = _toy(spark)
    cb = pq_fit(df, m=4, k=8, seed=5)
    a = pq_encode(df, cb, m=4).toPandas().set_index("id").sort_index()
    b = pq_encode(df, cb, m=4).toPandas().set_index("id").sort_index()
    assert all(len(c) == 4 for c in a["codes"])
    assert all(0 <= v < 8 for c in a["codes"] for v in c)
    assert [list(c) for c in a["codes"]] == [list(c) for c in b["codes"]]


def test_encode_matches_numpy_argmin(spark):
    """The HOF argmin picks the same code numpy would, per sub-space."""
    df, x = _toy(spark, n=60, d=8)
    m, ds = 4, 2
    cb = pq_fit(df, m=m, k=4, seed=1)
    cbp = cb.toPandas()
    cents = {
        s: np.array(
            [r["centroid"] for _, r in cbp[cbp["sub"] == s].sort_values("code").iterrows()]
        )
        for s in range(m)
    }
    got = pq_encode(df, cb, m=m).toPandas().set_index("id").sort_index()
    for i in range(len(x)):
        for s in range(m):
            subv = x[i, s * ds : (s + 1) * ds]
            want = int(np.argmin(((cents[s] - subv) ** 2).sum(axis=1)))
            assert got.loc[i, "codes"][s] == want


def test_ivf_pq_recall(spark):
    df, x = _toy(spark, n=200, d=16)
    centroids = ivf_fit(df, n_cells=8, seed=3)
    cb = pq_fit(df, m=4, k=16, seed=2)
    got = (
        ivf_pq_topk(df, df.filter("vec_id < 12"), centroids, cb, m=4, k=5, n_probe=4)
        .toPandas()
        .groupby("q_id")["n_id"]
        .apply(set)
    )

    def exact_topk(q, k=5):
        d2 = ((x - x[q]) ** 2).sum(axis=1)
        d2[q] = np.inf
        order = np.lexsort((np.arange(len(x)), d2))
        return set(order[:k])

    recalls = [len(got[q] & exact_topk(q)) / 5.0 for q in range(12)]
    assert np.mean(recalls) >= 0.7, recalls


def test_exhaustive_probe_big_shortlist_is_exact(spark):
    """With every cell probed and a corpus-sized shortlist the exact
    re-rank sees all candidates — IVF-PQ degrades gracefully to exact
    search (rank and distance both)."""
    df, x = _toy(spark, n=80, d=8, n_clusters=4)
    centroids = ivf_fit(df, n_cells=4, seed=3)
    cb = pq_fit(df, m=4, k=8, seed=2)
    got = (
        ivf_pq_topk(
            df, df.filter("vec_id < 6"), centroids, cb,
            m=4, k=3, n_probe=4, shortlist=80,
        )
        .toPandas()
        .sort_values(["q_id", "rank"])
    )
    for q in range(6):
        d2 = ((x - x[q]) ** 2).sum(axis=1)
        d2[q] = np.inf
        order = np.lexsort((np.arange(len(x)), d2))
        want = [int(v) for v in order[:3]]
        assert list(got[got["q_id"] == q]["n_id"]) == want
