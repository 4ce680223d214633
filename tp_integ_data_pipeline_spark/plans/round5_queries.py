"""Round-5 operator surface: skew-mitigated joins, CDC log compaction,
linear interpolation, data-quality audit, stratified sampling, and
embedding-cosine near-dup clustering. All SURVEY.md §2.10 extension
operators (no reference-repo counterpart — the reference has neither
joins at scale nor a changelog; file:line citations live on the
operator docstrings they delegate to)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.asof import asof_join
from tp_integ_data_pipeline_spark.operators.change_feed import compact_cdc
from tp_integ_data_pipeline_spark.operators.dedup import dup_clusters
from tp_integ_data_pipeline_spark.operators.graph import triangle_count
from tp_integ_data_pipeline_spark.operators.quality_audit import (
    audit_checks,
    audit_reference,
    audit_uniqueness,
)
from tp_integ_data_pipeline_spark.operators.search import postings, search_all_terms
from tp_integ_data_pipeline_spark.operators.similarity import cosine_pairs
from tp_integ_data_pipeline_spark.operators.skew import salted_join, skew_report
from tp_integ_data_pipeline_spark.operators.timeseries import (
    interpolate_linear,
    robust_outliers,
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


# --------------------------------------------------------------------------
# q160 — time-series AS-OF join (latest prior purchase per click)
# --------------------------------------------------------------------------
@query(
    "q160_asof_join",
    oracle="""
    WITH l AS (
        SELECT user_id % 100 AS k, ts, event_id, value
        FROM events WHERE event_type = 'click'
    ),
    r AS (
        SELECT user_id % 100 AS k, ts, event_id AS seq, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT l.k, l.event_id, l.ts, ROUND(l.value, 6) AS click_value,
           ROUND(m.value, 6) AS last_purchase_value
    FROM l LEFT JOIN LATERAL (
        SELECT r.value FROM r
        WHERE r.k = l.k AND r.ts <= l.ts
        ORDER BY r.ts DESC, r.seq DESC LIMIT 1
    ) m ON TRUE
    ORDER BY l.k, l.event_id
    """,
)
def q160_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the value of the user's latest prior-or-equal
    purchase (pandas merge_asof semantics). The engine runs the
    union-tag-and-carry-forward shape (operators/asof.py: ONE keyed
    sort, output-sized, never a range join or per-row lateral scan);
    the oracle is the explicit LATERAL latest-prior lookup — the
    hash-match pins inclusive-tie and duplicate-timestamp (seq
    tie-break) semantics."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        (F.col("user_id") % 100).alias("k"),
        "event_id",
        "ts",
        F.round("value", 6).alias("click_value"),
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 100).alias("k"),
        "ts",
        F.col("event_id").alias("seq"),
        F.round("value", 6).alias("last_purchase_value"),
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_seq="seq", right_vals=["last_purchase_value"],
    )
    return out.select(
        "k", "event_id", "ts", "click_value", "last_purchase_value"
    ).orderBy("k", "event_id")


# --------------------------------------------------------------------------
# q161 — inverted-index conjunctive keyword search
# --------------------------------------------------------------------------
_SEARCH_TERMS = ["join", "filter"]


@query(
    "q161_inverted_search",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE list_contains(string_split(text, ' '), '{_SEARCH_TERMS[0]}')
      AND list_contains(string_split(text, ' '), '{_SEARCH_TERMS[1]}')
    ORDER BY doc_id
    """,
)
def q161_inverted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-search for documents containing all query terms THROUGH the
    inverted index (operators/search.py): the engine filters the
    posting relation to the m terms and intersects with one doc-keyed
    aggregate — cost tracks the terms' posting lengths, not corpus
    size — while the oracle rescans every document's text. The
    hash-match proves the index path returns exactly the rescan's
    answer."""
    docs = load_table(spark, sf_dir, "documents")
    post = postings(docs, "doc_id", "text")
    hits = search_all_terms(post, _SEARCH_TERMS, id_col="id")
    return (
        hits.join(docs, hits["id"] == docs["doc_id"])
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q162 — robust per-group outlier detection (median/MAD modified z)
# --------------------------------------------------------------------------
@query(
    "q162_robust_outliers",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT event_type, AVG(value) AS med FROM ranked
        WHERE rk = FLOOR((n + 1) / 2.0) OR rk = CEIL((n + 1) / 2.0)
        GROUP BY event_type
    ),
    ad AS (
        SELECT e.event_type, ABS(e.value - m.med) AS adv, m.med
        FROM events e JOIN med m USING (event_type)
    ),
    ranked2 AS (
        SELECT event_type, adv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adv) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM ad
    ),
    mad AS (
        SELECT event_type, AVG(adv) AS mad FROM ranked2
        WHERE rk = FLOOR((n + 1) / 2.0) OR rk = CEIL((n + 1) / 2.0)
        GROUP BY event_type
    )
    SELECT e.event_type, ROUND(m.med, 6) AS med, ROUND(d.mad, 6) AS mad,
           COUNT(*) AS n,
           COUNT(*) FILTER (
               WHERE d.mad > 0 AND ABS(0.6745 * (e.value - m.med) / d.mad) > 3.5
           ) AS n_outliers
    FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
    GROUP BY e.event_type, m.med, d.mad
    ORDER BY e.event_type
    """,
)
def q162_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier rates per event type via the Iglewicz-Hoaglin modified
    z-score over exact median/MAD — robust to the outliers themselves,
    unlike mean/stddev. Both medians use the rank/count formulation
    (distributed in-group sort, q131's pattern; the oracle spells the
    identical formulation so even-count interpolation is arithmetic-
    for-arithmetic the same), never Spark's one-buffer percentile
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    out = robust_outliers(ev.select("event_type", "value"), ["event_type"], "value")
    return out.select(
        "event_type",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n",
        "n_outliers",
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q163 — triangle counting on the part co-occurrence graph
# --------------------------------------------------------------------------
@query(
    "q163_triangle_count",
    oracle="""
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.p2 = e2.p1 JOIN e e3
      ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    """,
)
def q163_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the parts-bought-together graph. Edge construction
    is ROW-LOCAL (per-order sorted part set exploded into pairs — lines
    per order are bounded, never a fact self-join), and the count runs
    the degree-oriented algorithm (operators/graph.triangle_count):
    every node's out-adjacency is O(sqrt(m)) after orientation, so the
    wedge join survives celebrity parts at 100 TB. The oracle is the
    naive three-way self-join — fine at check scale, the contrast is
    the point."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS src, y AS dst))))"
    )
    edges = (
        per_order.select(F.explode(pair_expr).alias("e"))
        .select("e.src", "e.dst")
        .distinct()
    )
    return triangle_count(edges)
