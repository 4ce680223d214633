"""Python UDTF surface (§2.9 UDTF — extension-only per SURVEY) and
lake write-path queries (S6 exercised inside the oracle-checked path).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table, scratch_dir
from tp_integ_data_pipeline_spark.sources.lake import DataLake


@udtf(returnType="tok string, pos int")
class SplitTokens:
    """Python UDTF (Spark 4): one row per token with its position —
    the table-function generalization of the reference's row-wise
    Series.apply surface."""

    def eval(self, text: str):
        if text:
            for i, tok in enumerate(text.split(" ")):
                yield tok, i


@query(
    "q46_udtf_tokens",
    oracle="""
    SELECT tok, COUNT(*) AS n
    FROM (
        SELECT unnest(string_split(text, ' ')) AS tok,
               unnest(range(len(string_split(text, ' ')))) AS pos
        FROM documents
    )
    WHERE pos < 3
    GROUP BY tok
    ORDER BY tok
    """,
)
def q46_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-token histogram via a LATERAL Python UDTF join."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("split_tokens", SplitTokens)
    return spark.sql(
        """
        SELECT s.tok, COUNT(*) AS n
        FROM documents, LATERAL split_tokens(text) s
        WHERE s.pos < 3
        GROUP BY s.tok
        ORDER BY s.tok
        """
    )


@query(
    "q45_lake_roundtrip",
    oracle="""
    SELECT strftime(l_shipdate, '%m-%d-%y') AS fecha_partic,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-10-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q45_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 write path INSIDE the checked query: land a lineitem slice in
    a hive-partitioned lake (twice — idempotency via anti-join dedup),
    read it back through partition discovery, aggregate. The oracle is
    the direct query: the lake roundtrip must be value-invisible."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-10-01").cast("timestamp")
    )
    staged = li.withColumn("fecha_partic", F.date_format("l_shipdate", "MM-dd-yy"))
    lake = DataLake(spark, scratch_dir(prefix="lake_q45_"))
    keys = ["l_orderkey", "l_linenumber"]
    # probe_partitions=True: fecha_partic is derived from l_shipdate,
    # which is fixed per (l_orderkey, l_linenumber) — key → partition FD
    lake.write_incremental("li", staged, ["fecha_partic"], dedup_keys=keys, probe_partitions=True)
    lake.write_incremental("li", staged, ["fecha_partic"], dedup_keys=keys, probe_partitions=True)  # no-op re-run
    back = lake.read("li")
    return (
        back.groupBy("fecha_partic")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias(
                "total_price"
            ),
        )
        .orderBy("fecha_partic")
    )
