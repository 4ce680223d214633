"""Record-linkage queries (operators/linkage.py): fuzzy key matching
of a deterministically-corrupted feed back to the master table. The
DuckDB oracle does the naive all-pairs levenshtein join, so the
hash-match proves the delete-neighborhood blocking is recall-complete
at ed<=1 — a blocking miss would drop a pair and fail the compare."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.linkage import edit_distance_join
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table


@query(
    "q145_fuzzy_linkage",
    oracle="""
    WITH dirty AS (
        SELECT c_custkey AS d_id,
               substr(c_name, 1, c_custkey % length(c_name)) ||
               substr(c_name, (c_custkey % length(c_name)) + 2) AS dname
        FROM customer WHERE c_custkey % 5 = 0
    )
    SELECT d.d_id, c.c_custkey AS m_id,
           levenshtein(d.dname, c.c_name) AS dist
    FROM dirty d JOIN customer c ON levenshtein(d.dname, c.c_name) <= 1
    ORDER BY d_id, m_id
    """,
)
def q145_fuzzy_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link a dirty feed (every 5th customer name with the
    (custkey mod len)-th character deleted) back to the master by edit
    distance <= 1. Spark path: symmetric-delete neighborhood explode →
    variant equi-join → exact levenshtein verify on candidates only —
    never an all-pairs compare (the oracle's shape, fine for DuckDB at
    check scale, Θ(n·m) at 100 TB). The match set includes the
    near-collisions TPC-H's dense name space creates (digit-substituted
    siblings), not just the planted source row — all hash-checked."""
    c = load_table(spark, sf_dir, "customer")
    dirty = c.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("d_id"),
        F.expr(
            "concat(substr(c_name, 1, c_custkey % length(c_name)), "
            "substr(c_name, (c_custkey % length(c_name)) + 2))"
        ).alias("dname"),
    )
    master = c.select("c_custkey", "c_name")
    return (
        edit_distance_join(
            dirty, master,
            left_key="dname", right_key="c_name",
            left_id="d_id", right_id="c_custkey",
        )
        .select("d_id", F.col("c_custkey").alias("m_id"), "dist")
        .orderBy("d_id", "m_id")
    )
