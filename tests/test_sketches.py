"""Mergeable heavy-hitters (operators/sketches.py): bound guarantees
under capacity pressure, exactness in the complete regime, and the
q147 fixture staying inside that regime at both graded SFs."""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.sketches import (
    merge_shard_topk,
    shard_topk_partials,
)

ROWS = (
    [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20 + [("d",)] * 10
    + [(w,) for w in "efghijklmnop"] * 2
)


def _df(spark, parts=6):
    df = spark.createDataFrame(ROWS, "tok string").repartition(parts)
    return df.select(
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(4)).alias("shard"),
        "tok",
    )


def _truth():
    return Counter(w for (w,) in ROWS)


def test_exact_regime_equals_truth(spark):
    df = _df(spark)
    kept, cutoffs = shard_topk_partials(df, key="tok", shard="shard", c=1000)
    got = merge_shard_topk(kept, cutoffs, key="tok", shard="shard", k=4).collect()
    truth = _truth()
    assert [(r["tok"], r["lower"], r["upper"]) for r in got] == [
        ("a", 50, 50),
        ("b", 30, 30),
        ("c", 20, 20),
        ("d", 10, 10),
    ]
    assert all(r["lower"] == truth[r["tok"]] for r in got)


def test_bounds_contain_truth_under_capacity(spark):
    df = _df(spark)
    truth = _truth()
    kept, cutoffs = shard_topk_partials(df, key="tok", shard="shard", c=3)
    got = merge_shard_topk(kept, cutoffs, key="tok", shard="shard", k=8).collect()
    assert got, "capacity-limited merge returned nothing"
    for r in got:
        assert r["lower"] <= truth[r["tok"]] <= r["upper"], (
            r["tok"], r["lower"], truth[r["tok"]], r["upper"]
        )
    # the unambiguous heavy hitter still surfaces first
    assert got[0]["tok"] == "a"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_q147_fixture_in_exact_regime(spark, sf_dir):
    """q147's exact-count oracle is only valid while every shard's
    distinct token count stays under its capacity — fail loudly here
    (the q120 HLL regime-guard pattern) rather than silently in the
    driver if the fixture outgrows it."""
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    from tp_integ_data_pipeline_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    per_shard = (
        docs.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(16)).alias("shard"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .groupBy("shard")
        .agg(F.countDistinct("tok").alias("d"))
        .agg(F.max("d").alias("mx"))
        .collect()[0]["mx"]
    )
    assert per_shard < 200_000, per_shard


def test_exactly_c_distinct_is_still_exact(spark):
    """A shard with EXACTLY c distinct keys truncated nothing — its
    cutoff must be 0 so keys it fully counted keep lower == upper."""
    rows = [(0, "a")] * 5 + [(0, "b")] * 3 + [(0, "c")] * 2 + [(1, "a")] * 4
    df = spark.createDataFrame(rows, "shard long, tok string")
    # shard 0 has exactly c=3 distinct keys; shard 1 has 1
    kept, cutoffs = shard_topk_partials(df, key="tok", shard="shard", c=3)
    cut = {r["shard"]: r["cutoff"] for r in cutoffs.collect()}
    assert cut == {0: 0, 1: 0}
    got = merge_shard_topk(kept, cutoffs, key="tok", shard="shard", k=3).collect()
    assert [(r["tok"], r["lower"], r["upper"]) for r in got] == [
        ("a", 9, 9), ("b", 3, 3), ("c", 2, 2)
    ]


def test_cms_estimate_depth_guard(spark):
    """cms_estimate rejects depth > 4 like cms_build does — without the
    guard, row 4+ reads past the 32-hex md5 digest and the left join +
    coalesce(0) silently min-reduces every estimate to 0 (r7 ADVICE)."""
    from tp_integ_data_pipeline_spark.operators.sketches import cms_build, cms_estimate

    keyed = spark.createDataFrame([("a",), ("a",), ("b",)], "key string")
    sketch = cms_build(keyed, depth=4)
    with pytest.raises(ValueError, match="depth > 4"):
        cms_estimate(sketch, keyed.distinct(), depth=5)
    with pytest.raises(ValueError, match="depth > 4"):
        cms_build(keyed, depth=5)
