"""Link-analysis queries (operators/graph.py) over a supplier↔customer
graph derived from lineitem ⋈ orders. No reference-repo counterpart —
SURVEY.md §2.10 extension surface: the rank-side companion to the
connected-components dedup loop (web-graph authority signals feeding
corpus keep/drop decisions).

The oracle expresses the SAME fixed-iteration recurrence as five
chained CTE layers (aggregation inside a recursive CTE term is not
portable SQL) — every iteration of the Spark loop is hash-checked,
not just the fixed point."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.graph import pagerank
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table

_ITERS = 5
_DAMPING = 0.85


def _oracle() -> str:
    head = """
    WITH pairs AS (
        SELECT DISTINCT l_suppkey + 10000000 AS s, o_custkey AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT s AS src, c AS dst FROM pairs
        UNION ALL
        SELECT c AS src, s AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    p0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(f""",
    p{i} AS (
        SELECT n.node,
               {1.0 - _DAMPING} / (SELECT n FROM nn)
               + {_DAMPING} * COALESCE(SUM(p.r / d.deg), 0) AS r
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN p{i - 1} p ON p.node = e.src
        LEFT JOIN deg d ON d.node = e.src
        GROUP BY n.node
    )""")
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node, ROUND(r, 6) AS rank FROM p{_ITERS} ORDER BY node
    """
    )


@query("q141_pagerank", oracle=_oracle())
def q141_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five PageRank iterations on the symmetrized supplier↔customer
    trade graph. Spark loop shape (operators/graph.pagerank): per
    iteration ONE src-keyed equi-join + ONE dst-keyed map-side-combined
    rollup, dangling mass as an audited 1-row scalar broadcast, ranks
    lazily localCheckpoint'd so lineage stays O(1) — the CC-loop
    pattern. Symmetrized edges mean no dangling nodes here (that path
    contributes exactly 0 but is still planned and audited); the
    dangling redistribution itself is pytest-covered on a directed
    graph (tests/test_graph.py)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("l_suppkey") + 10000000).alias("s"), F.col("o_custkey").alias("c")
        )
        .distinct()
    )
    edges = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionByName(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    return (
        pagerank(edges, iters=_ITERS, damping=_DAMPING)
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy("node")
    )
