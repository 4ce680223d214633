"""Round-5 operator surface: skew-mitigated joins, CDC log compaction,
linear interpolation, data-quality audit, stratified sampling, and
embedding-cosine near-dup clustering. All SURVEY.md §2.10 extension
operators (no reference-repo counterpart — the reference has neither
joins at scale nor a changelog; file:line citations live on the
operator docstrings they delegate to)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.change_feed import compact_cdc
from tp_integ_data_pipeline_spark.operators.dedup import dup_clusters
from tp_integ_data_pipeline_spark.operators.quality_audit import (
    audit_checks,
    audit_reference,
    audit_uniqueness,
)
from tp_integ_data_pipeline_spark.operators.similarity import cosine_pairs
from tp_integ_data_pipeline_spark.operators.skew import salted_join, skew_report
from tp_integ_data_pipeline_spark.operators.timeseries import (
    interpolate_linear,
    stratified_sample,
)
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table

_N_SALTS = 8


# --------------------------------------------------------------------------
# q154 — skew-mitigated (salted) join == plain join, plus the skew report
# --------------------------------------------------------------------------
@query(
    "q154_salted_join",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN l_orderkey % 10 < 4 THEN 1 ELSE l_suppkey END AS sk,
               l_extendedprice
        FROM lineitem
    ),
    dim AS (SELECT s_suppkey AS sk, s_nationkey FROM supplier)
    SELECT d.s_nationkey,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(f.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM fact f JOIN dim d USING (sk)
    GROUP BY d.s_nationkey
    ORDER BY d.s_nationkey
    """,
)
def q154_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join under DELIBERATE skew: 40% of the fact lands on one
    key (sk=1), the regime where a plain shuffle join stalls one
    reducer at 100 TB. The engine runs the SALTED join — fact key
    extended with a deterministic xxhash64 salt, dim exploded once per
    salt, join on (key, salt) — while the oracle runs the plain join:
    the hash-match proves salting preserves row multiplicity exactly.
    The dim's replication factor (n_salts=8) is the bounded cost that
    buys an 8-way spread of the hot key."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 4, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("sk"),
        "l_extendedprice",
    )
    dim = sup.select(F.col("s_suppkey").alias("sk"), "s_nationkey")
    joined = salted_join(fact, dim, ["sk"], n_salts=_N_SALTS)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


# --------------------------------------------------------------------------
# q155 — CDC changelog compaction to the latest-state snapshot
# --------------------------------------------------------------------------
@query(
    "q155_cdc_compaction",
    oracle="""
    WITH feed AS (
        SELECT user_id % 500 AS k, ts, event_id AS seq,
               CASE WHEN event_type = 'purchase' THEN 'delete' ELSE 'upsert' END AS op,
               value
        FROM events
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC, seq DESC) AS rn
        FROM feed
    )
    SELECT k, ROUND(value, 6) AS value, ts, seq
    FROM ranked WHERE rn = 1 AND op <> 'delete'
    ORDER BY k
    """,
)
def q155_cdc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse a CDC event log (built from the events table: purchases
    act as deletes) to its latest-state snapshot. The engine compacts
    via ONE max_by aggregate per key — no window, no full-log sort,
    map-side combinable — while the oracle ranks with a window: the
    hash-match proves the aggregate picks the identical last row under
    the (ts, seq) total order, including dropping delete-terminated
    keys."""
    ev = load_table(spark, sf_dir, "events")
    feed = ev.select(
        (F.col("user_id") % 500).alias("k"),
        "ts",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "purchase", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        "value",
    )
    snap = compact_cdc(feed, ["k"], "ts", "seq", op_col="op")
    return snap.select("k", F.round("value", 6).alias("value"), "ts", "seq").orderBy("k")


# --------------------------------------------------------------------------
# q156 — grouped linear interpolation over the resampled event grid
# --------------------------------------------------------------------------
_BUCKET_S = 21600  # 6 h, same grid as q140


@query(
    "q156_linear_interpolation",
    oracle=f"""
    WITH per AS (
        SELECT user_id % 50 AS k,
               CAST(FLOOR(epoch(ts) / {_BUCKET_S}) AS BIGINT) AS bucket,
               SUM(value) AS v
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT k, MIN(bucket) AS mn, MAX(bucket) AS mx FROM per GROUP BY k),
    grid AS (SELECT k, UNNEST(range(mn, mx + 1)) AS bucket FROM span),
    joined AS (
        SELECT g.k, g.bucket,
               CASE WHEN g.bucket % 3 = 0 THEN NULL ELSE p.v END AS v
        FROM grid g LEFT JOIN per p USING (k, bucket)
    ),
    anch AS (
        SELECT k, bucket, v,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY bucket
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY bucket
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
        FROM joined
    )
    SELECT k, bucket, CAST(v IS NULL AS INT) AS was_gap,
           ROUND(CASE
               WHEN v IS NOT NULL THEN v
               WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt
                   THEN pv + (nv - pv) * (bucket - pt) / (nt - pt)
               WHEN pv IS NOT NULL THEN pv
               ELSE nv
           END, 6) AS v_interp
    FROM anch ORDER BY k, bucket
    """,
)
def q156_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across holes in a per-key 6-hour grid
    (every third bucket's value is masked to null to plant
    deterministic gaps, including multi-bucket runs at series edges).
    Complements q140's LOCF: interpolation needs BOTH anchors, so the
    operator runs two frame-bounded windows over one (k, bucket) sort
    — one shuffle — while the oracle re-derives the same anchors with
    IGNORE NULLS window functions. Leading/trailing gaps fall back to
    the single available anchor."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.select(
            (F.col("user_id") % 50).alias("k"),
            F.floor(F.col("ts").cast("double") / _BUCKET_S).alias("bucket"),
            "value",
        )
        .groupBy("k", "bucket")
        .agg(F.sum("value").alias("v"))
    )
    span = per.groupBy("k").agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    grid = span.select("k", F.explode(F.sequence("mn", "mx")).alias("bucket"))
    joined = grid.join(per, ["k", "bucket"], "left").select(
        "k",
        "bucket",
        F.when(F.col("bucket") % 3 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("v"))
        .alias("v"),
    )
    out = interpolate_linear(joined, "k", "bucket", "v", out_col="v_interp")
    return out.select(
        "k",
        "bucket",
        F.col("v").isNull().cast("int").alias("was_gap"),
        F.round("v_interp", 6).alias("v_interp"),
    ).orderBy("k", "bucket")


# --------------------------------------------------------------------------
# q157 — data-quality audit battery (one report, alert-ready)
# --------------------------------------------------------------------------
@query(
    "q157_dq_audit",
    oracle="""
    SELECT 'orders.null_custkey' AS check_name,
           COUNT(*) FILTER (WHERE o_custkey IS NULL) AS violations FROM orders
    UNION ALL
    SELECT 'orders.bad_status',
           COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) FROM orders
    UNION ALL
    SELECT 'orders.nonpositive_total',
           COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders
    UNION ALL
    SELECT 'orders.dup_orderkey',
           CAST(SUM(n - 1) AS BIGINT) FROM (
               SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'lineitem.discount_range',
           COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) FROM lineitem
    UNION ALL
    SELECT 'lineitem.ship_before_order',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate < o.o_orderdate
    UNION ALL
    SELECT 'lineitem.orphan_orderkey',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    ORDER BY check_name
    """,
)
def q157_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The load-gate audit a warehouse runs per batch: null/range/enum
    checks (fused into ONE scan per table via conditional counts +
    stack unpivot), key-uniqueness (one keyed aggregate), cross-table
    ship-before-order consistency and referential orphans (one join
    each). Output is the long-format (check, violations) report an
    alerting rule consumes — the engine-side equivalent of the
    reference trusting its API schema implicitly."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    single = audit_checks(
        orders,
        {
            "orders.null_custkey": F.col("o_custkey").isNull(),
            "orders.bad_status": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "orders.nonpositive_total": F.col("o_totalprice") <= 0,
        },
    )
    li_single = audit_checks(
        li, {"lineitem.discount_range": (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)}
    )
    uniq = audit_uniqueness(orders, ["o_orderkey"], "orders.dup_orderkey")
    consistency = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(
            F.lit("lineitem.ship_before_order").alias("check"),
            F.count(F.lit(1)).alias("violations"),
        )
    )
    orphans = audit_reference(li, orders, ["l_orderkey"], ["o_orderkey"], "lineitem.orphan_orderkey")
    return (
        single.unionByName(li_single)
        .unionByName(uniq)
        .unionByName(consistency)
        .unionByName(orphans)
        .select(F.col("check").alias("check_name"), F.col("violations").cast("long").alias("violations"))
        .orderBy("check_name")
    )


# --------------------------------------------------------------------------
# q158 — deterministic exact-k stratified sample
# --------------------------------------------------------------------------
_STRAT_K = 5


@query(
    "q158_stratified_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, source, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    )
    SELECT lang, source, doc_id, n_chars
    FROM ranked WHERE rk <= {_STRAT_K}
    ORDER BY lang, source, doc_id
    """,
)
def q158_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact {_STRAT_K}-per-(lang, source) sample, ranked by a content
    hash of the id so the draw is uniform-ish yet BIT-reproducible
    across engines and runs (md5 exists in both; xxhash64 does not in
    DuckDB). The stratum window is keyed (partition columns present →
    plan-gate clean) and Spark's rank-limit pushdown keeps per-task
    state at k rows per stratum."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, ["lang", "source"], "doc_id", _STRAT_K)
        .select("lang", "source", "doc_id", "n_chars")
        .orderBy("lang", "source", "doc_id")
    )


# --------------------------------------------------------------------------
# q159 — embedding-cosine near-dup clusters (the embedding-side analogue
# of q87's MinHash clusters; completes the dedup-family matrix)
# --------------------------------------------------------------------------
_COS_TAU = 0.45


@query(
    "q159_embedding_dup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
              (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
               sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
              >= {_COS_TAU}
    ),
    sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
    reach(src, dst) AS (
        SELECT a AS src, a AS dst FROM sym
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ),
    membership AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src)
    SELECT cluster, COUNT(*) AS n_members, MIN(id) AS canonical
    FROM membership GROUP BY cluster
    ORDER BY cluster
    """,
)
def q159_embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup CLUSTERS: threshold the blocked-numpy
    cosine pairs (q44's operator) at {_COS_TAU}, run the large-star/
    small-star connected-components loop (q87's operator), and report
    per-cluster size + min-id canonical. The engine side composes the
    two scale paths (blocked matmul, O(log n) CC rounds); the oracle
    recomputes the identical clusters with a quadratic join + recursive
    CTE — fine at check scale, the point at 100 TB is precisely that
    the engine does NOT do that."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_pairs(emb, threshold=_COS_TAU).select("a", "b")
    membership = dup_clusters(pairs)
    return (
        membership.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"), F.min("id").alias("canonical"))
        .orderBy("cluster")
    )
