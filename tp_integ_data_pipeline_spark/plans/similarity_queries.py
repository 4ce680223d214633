"""Similarity-search queries (X3) over the `embeddings` fixture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.similarity import ann_topk_srp, knn_bruteforce
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table

_COS = (
    "list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) /"
    " (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *"
    "  sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[]))))"
)


@query(
    "q50_knn_bruteforce",
    oracle=f"""
    SELECT q_id, n_id, CAST(rank AS INT) AS rank, round(cos, 6) AS cos6
    FROM (
        SELECT q.vec_id AS q_id, n.vec_id AS n_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, n.vec_id) AS rank,
               {_COS} AS cos
        FROM embeddings q JOIN embeddings n ON n.vec_id != q.vec_id
        WHERE q.vec_id < 10
    )
    WHERE rank <= 5
    ORDER BY q_id, rank
    """,
)
def q50_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return knn_bruteforce(emb, queries_df, k=5).orderBy("q_id", "rank")


# Approximate by design (SRP-LSH candidate recall < 1) → rows-only check.
@query("q51_ann_srp_topk")
def q51_ann_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return ann_topk_srp(emb, queries_df, k=5).orderBy("q_id", "rank")
