"""Wider TPC-H-shaped relational coverage (Q2/Q7/Q9/Q10/Q11/Q13/Q15/
Q18/Q21/Q22 analogs, adapted to the driver star schema — no partsupp
table, so cost-based shapes substitute ``p_retailprice``).

These exercise the remaining classic plan shapes the earlier modules
don't: multi-way join chains with dual nation roles, correlated
min-per-group, HAVING against a scalar subquery, left-outer count
distributions, only-one-qualifier anti-join logic, and scalar-subquery
+ NOT EXISTS combos. All are Catalyst-native (joins are broadcast
where the build side is a dim; aggregations are partial/map-side
combined; every float aggregate uses the DECIMAL-exact sum contract
from plans.relational for bit-identical oracle parity).

Scale notes (100 TB design): every query here shuffles only on its
group/join keys; dims (nation/supplier/part/customer at fixture scale)
broadcast; fact-fact joins (orders⋈lineitem) hash-partition on
orderkey — co-partitioned under bucketing in a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.joins import maybe_broadcast
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.plans.relational import _dsum, davg_sql, dsum_sql
from tp_integ_data_pipeline_spark.sources.fixtures import load_table


# --------------------------------------------------------------------------
# q77 — returned-item report (TPC-H Q10 shape): top customers by
# revenue lost to returns. 4-way join + group + top-k.
# --------------------------------------------------------------------------
@query(
    "q77_returned_top_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q77_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q78 — customer order-count distribution (TPC-H Q13 shape):
# left outer join + per-customer count + count-of-counts.
# --------------------------------------------------------------------------
@query(
    "q78_cust_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q78_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# q79 — top supplier by quarterly revenue (TPC-H Q15 shape):
# CTE/view + scalar-max selection (ties all kept, like the spec).
# --------------------------------------------------------------------------
@query(
    "q79_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q79_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    # Scalar max as a 1-row aggregate joined back on equality — a
    # BroadcastHashJoin, never an empty-frame window (which would sort
    # the whole supplier-cardinality relation into ONE partition; the
    # audit_plans global-window gate now rejects that shape).
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(maybe_broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q80 — large-volume customers (TPC-H Q18 shape): HAVING-filtered
# semi-join from an aggregated subquery back to the fact chain.
# --------------------------------------------------------------------------
@query(
    "q80_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 140
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
)
def q80_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 140)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(50)
    )


# --------------------------------------------------------------------------
# q81 — bilateral trade volume (TPC-H Q7 shape): nation dim joined in
# TWO roles (supplier side + customer side) with a symmetric pair
# predicate, yearly rollup.
# --------------------------------------------------------------------------
@query(
    "q81_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q81_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
        | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(maybe_broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_dsum(rev).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# q82 — product-line profit by nation and year (TPC-H Q9 shape; cost
# term substitutes p_retailprice for the missing ps_supplycost).
# --------------------------------------------------------------------------
@query(
    "q82_profit_by_nation_year",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity', 4)} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q82_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(maybe_broadcast(p), l.l_partkey == p.p_partkey)
        .join(maybe_broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_dsum(profit, 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# q83 — cheapest part per type (TPC-H Q2's correlated-min shape):
# rows whose price equals their group minimum.
# --------------------------------------------------------------------------
@query(
    "q83_min_price_per_type",
    oracle="""
    SELECT p.p_type, p.p_partkey, p.p_name, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
        SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
    )
    ORDER BY p.p_type, p.p_partkey
    """,
)
def q83_min_price_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    # Correlated scalar subquery ≙ per-group min window; one shuffle on
    # p_type, no self-join (the naive Q2 translation joins part twice).
    w = W.partitionBy("p_type")
    return (
        p.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


# --------------------------------------------------------------------------
# q84 — lone late shipper (TPC-H Q21 shape): suppliers that were the
# ONLY late shipper on multi-supplier orders. EXISTS + NOT EXISTS over
# self-joined facts → semi/anti joins on (orderkey, suppkey) sets.
# --------------------------------------------------------------------------
@query(
    "q84_lone_late_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                        ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 75 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q84_lone_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")

    base = l.join(o, l.l_orderkey == o.o_orderkey)
    # Q21 counts every qualifying l1 ROW (a supplier twice-late on one
    # order counts twice) — no distinct here; dedup only the semi/anti
    # probe sides, where multiplicity is irrelevant.
    l1 = base.filter(F.col("l_shipdate") > late_cut).select("l_orderkey", "l_suppkey")
    # EXISTS other-supplier rows: distinct (order, supp) pairs beat the
    # raw fact self-join — dedup before the shuffle, not after.
    pairs = l.select("l_orderkey", "l_suppkey").distinct()
    other = pairs.alias("a").join(
        pairs.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        "left_semi",
    )
    late_pairs = l1.alias("x")
    other_late = (
        base.filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .alias("c")
    )
    lone = (
        late_pairs.join(
            other.alias("oth"),
            (F.col("x.l_orderkey") == F.col("oth.l_orderkey"))
            & (F.col("x.l_suppkey") == F.col("oth.l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("x.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("x.l_suppkey") != F.col("c.l_suppkey")),
            "left_anti",
        )
    )
    return (
        lone.join(maybe_broadcast(s), F.col("x.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# --------------------------------------------------------------------------
# q85 — idle high-balance customers (TPC-H Q22 shape): scalar AVG
# subquery + NOT EXISTS (anti-join), grouped by a derived code.
# --------------------------------------------------------------------------
@query(
    "q85_idle_rich_customers",
    oracle=f"""
    SELECT c.c_nationkey % 5 AS code,
           COUNT(*) AS numcust,
           {dsum_sql('c.c_acctbal', 2)} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT {davg_sql('c2.c_acctbal', 2)} FROM customer c2 WHERE c2.c_acctbal > 0
    )
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY code
    ORDER BY code
    """,
)
def q85_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # Scalar AVG as a 1-row broadcast cross join — the plan Catalyst
    # itself produces for an uncorrelated scalar subquery.
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .groupBy((F.col("c_nationkey") % 5).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("code")
    )


# --------------------------------------------------------------------------
# q86 — part value concentration (TPC-H Q11 shape): per-part value
# HAVING > scalar subquery. TPC-H uses a fixed fraction of total
# (0.0001/SF); we use 1.2× the average per-part value instead so the
# predicate is scale-free — a fixed fraction selects 0 rows once the
# part count outgrows it (verified: 38/380/3965 rows at the three SFs).
# --------------------------------------------------------------------------
@query(
    "q86_part_value_concentration",
    oracle=f"""
    SELECT l_partkey,
           {dsum_sql('l_extendedprice * l_quantity', 2)} AS value
    FROM lineitem
    GROUP BY l_partkey
    HAVING {dsum_sql('l_extendedprice * l_quantity', 2)} > (
        SELECT 1.2 * {dsum_sql('l_extendedprice * l_quantity', 2)}
                   / COUNT(DISTINCT l_partkey)
        FROM lineitem
    )
    ORDER BY value DESC, l_partkey
    """,
)
def q86_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = l.groupBy("l_partkey").agg(_dsum(val, 2).alias("value"))
    total = l.agg(
        (F.lit(1.2) * _dsum(val, 2) / F.countDistinct("l_partkey")).alias("cutoff")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("cutoff"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )
