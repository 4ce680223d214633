"""Training-data-pipeline operators beyond the X1-X5 set: embedding
quantization, TF-IDF, data-quality auditing, deterministic dataset
splits — the everyday verbs of a 100 TB data-curation job."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table


# --------------------------------------------------------------------------
# q53 — int8 symmetric quantization of embeddings
# --------------------------------------------------------------------------
@query(
    "q53_quantize_int8",
    oracle="""
    SELECT vec_id,
           CAST(list_min(q) AS INT) AS qmin,
           CAST(list_max(q) AS INT) AS qmax,
           CAST(list_sum(q) AS BIGINT) AS qsum
    FROM (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * 127.0 / list_max(list_transform(
                                   CAST(embedding AS DOUBLE[]), y -> abs(y)))) AS INT)) AS q
        FROM embeddings
    )
    ORDER BY vec_id
    """,
)
def q53_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = 127/max|x|) —
    the storage/serving transform for embedding tables; checksummed
    per vector for the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    max_abs = F.array_max(F.transform(dv, lambda x: F.abs(x)))
    q = F.transform(dv, lambda x: F.round(x * F.lit(127.0) / max_abs).cast("int"))
    return (
        emb.select("vec_id", q.alias("q"))
        .select(
            "vec_id",
            F.array_min("q").alias("qmin"),
            F.array_max("q").alias("qmax"),
            F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + x).alias("qsum"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# q54 — TF-IDF top term per document
# --------------------------------------------------------------------------
@query(
    "q54_tfidf_top_term",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY 1, 2
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM tf) GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS score
        FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok AS top_term, score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, tok) AS rn FROM scored)
    WHERE rn = 1
    ORDER BY doc_id
    """,
)
def q54_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with smoothed idf = ln((N+1)/(df+1)); scores rounded to
    6 dp BEFORE ranking so cross-engine libm ULP differences cannot
    flip the ordering."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.select("doc_id", "tok").distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # N travels as a 1-row broadcast aggregate (the plan Catalyst emits
    # for an uncorrelated scalar subquery) — no eager docs.count() on
    # the driver during plan build. The vocabulary-sized df relation
    # joins via plain shuffle: at 100 TB the vocabulary is billions of
    # tokens, far past broadcast range, and tf is already shuffled on
    # tok's co-key so this stays one exchange.
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(df, "tok").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_term"), "score")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q75 — data-quality audit across tables
# --------------------------------------------------------------------------
@query(
    "q75_dq_audit",
    oracle="""
    SELECT 'orders_orphan_custkey' AS check_name,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
               AS n_violations
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'events_null_props',
           (SELECT COUNT(*) FROM events WHERE props IS NULL)
    UNION ALL
    SELECT 'documents_dup_text',
           (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
            FROM (SELECT COUNT(*) AS c FROM documents GROUP BY text HAVING COUNT(*) > 1))
    ORDER BY check_name
    """,
)
def q75_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit: FK orphans, null rates, duplicate payloads —
    each check an anti-join/aggregate, unioned into one report."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def check(name: str, df_count: DataFrame) -> DataFrame:
        return df_count.select(
            F.lit(name).alias("check_name"), F.col("n").cast("long").alias("n_violations")
        )

    orphan_orders = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )
    orphan_items = l.join(o, l.l_orderkey == o.o_orderkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )
    null_props = ev.filter(F.col("props").isNull()).agg(F.count(F.lit(1)).alias("n"))
    dup_text = (
        docs.groupBy("text")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n"))
    )
    return (
        check("orders_orphan_custkey", orphan_orders)
        .unionByName(check("lineitem_orphan_orderkey", orphan_items))
        .unionByName(check("events_null_props", null_props))
        .unionByName(check("documents_dup_text", dup_text))
        .orderBy("check_name")
    )


# --------------------------------------------------------------------------
# q76 — deterministic hash-based train/val/test split
# --------------------------------------------------------------------------
@query(
    "q76_train_split",
    oracle="""
    SELECT CASE WHEN d < 12 THEN 'train' WHEN d < 14 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT n_chars,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS INT) AS d
          FROM documents)
    GROUP BY 1
    ORDER BY 1
    """,
)
def q76_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-stable split on md5(id): hex digit 0-b → train (75%),
    c-d → val (12.5%), e-f → test (12.5%). Hash-based (not random):
    membership survives re-runs, resharding, and engine changes — the
    only sane way to split 100 TB reproducibly."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10).cast("int")
    split = (
        F.when(d < 12, "train").when(d < 14, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").cast("long").alias("total_chars"))
        .orderBy("split")
    )
