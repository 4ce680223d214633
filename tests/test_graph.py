"""PageRank (operators/graph.py): mass conservation with dangling
nodes, agreement with numpy power iteration, structural sanity."""

from __future__ import annotations

import numpy as np
import pytest

from tp_integ_data_pipeline_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iters, damping):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        dangle = r[out == 0].sum()
        nxt += damping * dangle / n
        for s, d in edges:
            nxt[idx[d]] += damping * r[idx[s]] / out[idx[s]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]  # 5 has no row; 4 dangles out-ok
DANGLING = [(1, 2), (2, 3), (3, 4)]  # 4 has NO out-edges


@pytest.mark.parametrize("edges", [EDGES, DANGLING])
def test_matches_numpy_and_conserves_mass(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=6).collect()}
    want = _numpy_pagerank(edges, iters=6, damping=0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hub_outranks_leaves(spark):
    # undirected star: hub 0 <-> leaves 1..6
    edges = [(0, i) for i in range(1, 7)] + [(i, 0) for i in range(1, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=8).collect()}
    assert all(got[0] > got[i] for i in range(1, 7))


def test_bad_iters_raises(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
