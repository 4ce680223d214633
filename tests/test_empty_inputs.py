"""Empty-input robustness: operators must degrade to empty results,
not crash — the 100 TB pipeline regularly sees empty partitions,
empty batches, and filters that eliminate everything."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tp_integ_data_pipeline_spark.operators.dedup import (
    minhash_near_dup_pairs,
    pair_jaccard,
    shingles,
    simhash_near_dup_pairs,
)
from tp_integ_data_pipeline_spark.operators.joins import asof_join
from tp_integ_data_pipeline_spark.operators.merge import insert_if_absent, scd1_upsert
from tp_integ_data_pipeline_spark.operators.similarity import cosine_pairs, knn_bruteforce


def _empty_docs(spark):
    return spark.createDataFrame(
        [], T.StructType([T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())])
    )


def test_dedup_ops_on_empty(spark):
    docs = _empty_docs(spark)
    assert shingles(docs, "doc_id", "text").count() == 0
    assert minhash_near_dup_pairs(docs, "doc_id", "text").count() == 0
    assert simhash_near_dup_pairs(docs, "doc_id", "text").count() == 0
    assert pair_jaccard(shingles(docs, "doc_id", "text")).count() == 0


def test_similarity_ops_on_empty(spark):
    emb = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    assert cosine_pairs(emb, threshold=0.5).count() == 0
    assert knn_bruteforce(emb, emb, k=3).count() == 0


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame([(1, "2023-01-01 00:00:00")], ["k", "ts"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    right = left.filter(F.lit(False)).withColumnRenamed("k", "k2").select(
        F.col("k2").alias("k"), "ts", F.lit(1).alias("payload")
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["payload"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0].asof_ts is None and rows[0].payload is None


def test_merge_ops_with_empty_sides(spark):
    t = spark.createDataFrame([(1, "a")], ["k", "v"])
    empty = t.filter(F.lit(False))
    assert insert_if_absent(t, empty, ["k"]).count() == 1
    assert insert_if_absent(empty, t, ["k"]).count() == 1
    merged = scd1_upsert(t, empty, ["k"], merge_date="2024-01-01")
    assert merged.count() == 1  # all rows untouched
