"""Inline-observability query (operators/observe.py): audit metrics
harvested from the SAME job as the write — the zero-extra-scan load
check a 100 TB pipeline needs instead of the write-then-recount
pattern."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.observe import audited_write
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table, scratch_dir


@query(
    "q135_observed_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           MIN(l_orderkey) AS min_key,
           MAX(l_orderkey) AS max_key,
           COUNT(*) FILTER (WHERE l_returnflag IS NULL) AS n_null_flag
    FROM lineitem
    WHERE l_discount > 0.05
    """,
)
def q135_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Land a lineitem slice in parquet and report the load-audit
    metrics (row count, checksum-style sum, key range, null count)
    computed by the write job itself via the Observation API — the
    plan's CollectMetrics node fills them from task results, so there
    is no second scan and no extra shuffle. The oracle recomputes the
    same aggregates directly; matching proves the inline metrics equal
    a dedicated audit query's answer. Sum runs in decimal so the
    single-pass metric is bit-comparable cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    m = audited_write(
        li,
        scratch_dir(prefix="obs_q135_") + "/out",
        {
            "n_rows": F.count(F.lit(1)),
            "sum_qty": F.sum(F.col("l_quantity").cast("decimal(18,2)")),
            "min_key": F.min("l_orderkey"),
            "max_key": F.max("l_orderkey"),
            "n_null_flag": F.count(F.when(F.col("l_returnflag").isNull(), 1)),
        },
    )
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                float(m["sum_qty"]),
                int(m["min_key"]),
                int(m["max_key"]),
                int(m["n_null_flag"]),
            )
        ],
        "n_rows long, sum_qty double, min_key long, max_key long, n_null_flag long",
    )


@query(
    "q148_pseudonymize_join",
    oracle="""
    WITH ev AS (
        SELECT substr(sha256('s3cret:person:' || CAST(user_id AS VARCHAR)), 1, 16)
                   AS p
        FROM events WHERE user_id IS NOT NULL
    ),
    cu AS (
        SELECT substr(sha256('s3cret:person:' || CAST(c_custkey AS VARCHAR)), 1, 16)
                   AS p,
               c_mktsegment
        FROM customer
    )
    SELECT c_mktsegment, COUNT(*) AS n_events,
           COUNT(DISTINCT ev.p) AS n_persons,
           MIN(ev.p) AS sample_pseudonym
    FROM ev JOIN cu ON ev.p = cu.p
    GROUP BY 1 ORDER BY 1
    """,
)
def q148_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style pseudonymization with referential integrity
    (operators/privacy.py): events.user_id and customer.c_custkey are
    replaced by salted-sha256 pseudonyms under the SAME role, then the
    tables are joined ON THE PSEUDONYMS — proving the irreversible ids
    still link across tables (the property that lets a shared dataset
    keep its join graph). Expression-level sha2, no UDF, no mapping
    table to secure; the oracle rebuilds the identical pseudonyms, so
    the actual hash values (not just counts) are verified."""
    from tp_integ_data_pipeline_spark.operators.privacy import pseudonymize

    ev = pseudonymize(
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id"),
        {"user_id": "person"},
        salt="s3cret",
    ).select(F.col("user_id").alias("p"))
    cu = pseudonymize(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        {"c_custkey": "person"},
        salt="s3cret",
    ).select(F.col("c_custkey").alias("p"), "c_mktsegment")
    return (
        ev.join(cu, "p")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("p").alias("n_persons"),
            F.min("p").alias("sample_pseudonym"),
        )
        .orderBy("c_mktsegment")
    )
