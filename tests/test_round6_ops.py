"""Round-6 operators: count-min sketch (build/estimate/merge),
k-anonymity report, BM25 ranking sanity, source novelty."""

from __future__ import annotations

from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.privacy import k_anonymity_report
from tp_integ_data_pipeline_spark.operators.search import bm25_topk
from tp_integ_data_pipeline_spark.operators.sketches import cms_build, cms_estimate


def _tokens(spark, words):
    return spark.createDataFrame([(w,) for w in words], "key string")


def test_cms_never_undercounts_and_is_exact_when_sparse(spark):
    words = ["a"] * 7 + ["b"] * 3 + ["c"]
    sketch = cms_build(_tokens(spark, words), depth=4, width=256)
    probes = _tokens(spark, ["a", "b", "c", "absent"])
    est = {r["key"]: r["cms_est"] for r in cms_estimate(sketch, probes).collect()}
    truth = {"a": 7, "b": 3, "c": 1, "absent": 0}
    for k, t in truth.items():
        assert est[k] >= t  # CMS never under-counts
    # 3 keys in 256 buckets: collisions virtually impossible -> exact
    assert est == truth


def test_cms_sketch_is_reaggregable(spark):
    """Union of shard sketches re-summed == sketch of the union — the
    mergeable-partial-state property the sketch family shares."""
    s1 = cms_build(_tokens(spark, ["x"] * 4 + ["y"]), depth=4, width=64)
    s2 = cms_build(_tokens(spark, ["x"] * 2 + ["z"]), depth=4, width=64)
    merged = (
        s1.unionByName(s2).groupBy("row", "bucket").agg(F.sum("c").alias("c"))
    )
    direct = cms_build(_tokens(spark, ["x"] * 6 + ["y", "z"]), depth=4, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cms_overcount_bounded_by_min_row(spark):
    """With width=2 collisions are forced; the estimate must still be
    >= truth for every key, and the depth-min must be <= any single
    row's counter (the min-reduction is doing its job)."""
    words = [c for c in "aaabbcddeeffgg"]
    sketch = cms_build(_tokens(spark, words), depth=4, width=2)
    probes = _tokens(spark, ["a", "g"])
    out = cms_estimate(sketch, probes, depth=4, width=2).collect()
    truth = {"a": 3, "g": 2}
    maxc = max(r["c"] for r in sketch.collect())
    for r in out:
        assert truth[r["key"]] <= r["cms_est"] <= maxc


def test_k_anonymity_classes_and_flags(spark):
    rows = [
        # class (1, 'A'): 3 rows, 2 sensitive values
        (1, "A", 10), (1, "A", 10), (1, "A", 20),
        # class (2, 'B'): 1 row -> at risk under k=2
        (2, "B", 30),
        # null quasi value forms its own class
        (None, "A", 40), (None, "A", 40),
    ]
    df = spark.createDataFrame(rows, "nat int, seg string, sens int")
    rep = {
        (r["nat"], r["seg"]): (r["class_size"], r["l_diversity"], r["at_risk"])
        for r in k_anonymity_report(df, ["nat", "seg"], "sens", k=2).collect()
    }
    assert rep[(1, "A")] == (3, 2, False)
    assert rep[(2, "B")] == (1, 1, True)
    assert rep[(None, "A")] == (2, 1, False)  # nulls group together


def test_bm25_ranks_term_dense_doc_first(spark):
    docs = spark.createDataFrame(
        [
            (0, "cat cat cat dog"),       # dense in 'cat'
            (1, "cat filler filler filler filler filler filler filler"),
            (2, "dog only here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["cat"], k=3).collect()
    assert out[0]["id"] == 0  # highest tf, short doc
    ids = [r["id"] for r in out]
    assert 3 not in ids and 2 not in ids  # no 'cat' -> no score row
    assert all(r["score"] > 0 for r in out)
