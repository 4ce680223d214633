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


# --------------------------------------------------------------------------
# q176 — entity resolution end-to-end: fuzzy match → connected
# components → entity summary (the blocking→matching→clustering
# pipeline a master-data system runs)
# --------------------------------------------------------------------------
@query(
    "q176_entity_resolution",
    oracle="""
    WITH RECURSIVE dirty AS (
        SELECT p_partkey AS d_id,
               substr(p_name, 1, p_partkey % length(p_name)) ||
               substr(p_name, (p_partkey % length(p_name)) + 2) AS dname
        FROM part WHERE p_partkey % 3 = 0
    ),
    matches AS (
        SELECT 2 * p.p_partkey AS a, 2 * d.d_id + 1 AS b
        FROM dirty d JOIN part p ON levenshtein(d.dname, p.p_name) <= 1
    ),
    sym AS (SELECT a, b FROM matches UNION SELECT b, a FROM matches),
    reach(src, dst) AS (
        SELECT a AS src, a AS dst FROM sym
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ),
    clusters AS (SELECT src AS id, MIN(dst) AS entity FROM reach GROUP BY src)
    SELECT entity,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(CASE WHEN id % 2 = 0 THEN 1 END) AS BIGINT) AS n_master,
           CAST(COUNT(CASE WHEN id % 2 = 1 THEN 1 END) AS BIGINT) AS n_dirty
    FROM clusters
    GROUP BY entity
    ORDER BY entity
    """,
)
def q176_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution (catalog dedup): a dirty feed of
    part names (one char deleted, keyed by partkey) links back to the
    master catalog by edit distance <= 1 (symmetric-delete blocking,
    never all-pairs), the match structure feeds the large-star/
    small-star connected-components loop (dup_clusters — the SAME
    clustering engine the text near-dup path uses), and each component
    becomes one ENTITY with master/dirty membership counts.

    Since round 7 the clustering runs at the NAME level: edges are
    matched (dname, p_name) KEY pairs (edit_distance_key_join), each
    name represented by one node — id = the smallest member's
    node id (2*min master key / 2*min dirty key + 1; per-name key
    sets are disjoint, so name-node ids are unique) — and per-name
    row counts fan back over the ≤|names| cluster assignment. The
    id-level edge fan-out was O(Σ reuse_l × reuse_r) rows (2.15M at
    sf0.1 — the round-6 cost), while the component structure and the
    min-node entity id are INVARIANT to it: all rows of a name share
    the same edges, so name-level components equal node-level
    components, the min over name-node ids equals the min over all
    node ids, and the membership sums equal the node counts — output
    identical, CC input collapses to |matched name pairs|. Node ids
    disambiguated row-locally (2*master, 2*dirty+1). The oracle
    replays the match condition all-pairs at the ID level plus a
    recursive-CTE closure (the q87 convention: entity = min reachable
    node) — the hash-match across the two formulations is itself the
    equivalence proof."""
    from tp_integ_data_pipeline_spark.operators.dedup import dup_clusters
    from tp_integ_data_pipeline_spark.operators.linkage import edit_distance_key_join

    part = load_table(spark, sf_dir, "part")
    dirty = part.filter(F.col("p_partkey") % 3 == 0).select(
        F.col("p_partkey").alias("d_id"),
        F.expr(
            "concat(substr(p_name, 1, p_partkey % length(p_name)), "
            "substr(p_name, (p_partkey % length(p_name)) + 2))"
        ).alias("dname"),
    )
    master = part.select("p_partkey", "p_name")
    m_names = master.groupBy("p_name").agg(
        F.count(F.lit(1)).alias("n_m"),
        (2 * F.min("p_partkey")).alias("m_node"),
    )
    d_names = dirty.groupBy("dname").agg(
        F.count(F.lit(1)).alias("n_d"),
        (2 * F.min("d_id") + 1).alias("d_node"),
    )
    kp = edit_distance_key_join(
        d_names.select("dname"), m_names.select("p_name"), "dname", "p_name"
    )
    edges = (
        kp.join(m_names, "p_name")
        .join(d_names, "dname")
        .select(F.col("m_node").alias("a"), F.col("d_node").alias("b"))
    )
    clusters = dup_clusters(edges)
    counts = m_names.select(
        F.col("m_node").alias("id"), F.col("n_m").alias("n_master"), F.lit(0).alias("n_dirty")
    ).unionByName(
        d_names.select(
            F.col("d_node").alias("id"), F.lit(0).alias("n_master"), F.col("n_d").alias("n_dirty")
        )
    )
    return (
        clusters.join(counts, "id")
        .groupBy(F.col("cluster").alias("entity"))
        .agg(
            F.sum(F.col("n_master") + F.col("n_dirty")).alias("n_members"),
            F.sum("n_master").alias("n_master"),
            F.sum("n_dirty").alias("n_dirty"),
        )
        .orderBy("entity")
    )
