"""Range join + null-handling and date-arithmetic batteries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table


# --------------------------------------------------------------------------
# q47 — range join via bucketization (guide: "bucketize the range key +
# equi-join on bucket + filter"). Pairs of events by the same user
# within 60 s of each other.
# --------------------------------------------------------------------------
@query(
    "q47_range_join",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_close_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
    GROUP BY a.user_id
    ORDER BY a.user_id
    """,
)
def q47_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join on (user, minute-bucket ± 1) prunes the quadratic
    candidate space to adjacent buckets, then the exact |Δt| ≤ 60 s
    predicate filters — the scalable form of an interval self-join
    (a raw theta-join would be O(n²) per user). Only the left side is
    bucket-exploded (2×). Pairing is SYMMETRIC (a_id != b_id, then
    canonicalized to (least, greatest) ids before distinct): for any
    qualifying pair the orientation whose a-side sits in the earlier
    bucket always matches, so coverage never depends on event ids
    being ordered like timestamps — an a_id < b_id join predicate
    would silently drop boundary-straddling pairs whose smaller id is
    the later event."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    us = F.unix_micros(F.col("ts"))
    minute = (us / F.lit(60_000_000)).cast("long")
    left = ev.select(
        "user_id", F.col("event_id").alias("a_id"), us.alias("a_us"), minute.alias("m")
    ).withColumn("bucket", F.explode(F.array(F.col("m"), F.col("m") + 1))).drop("m")
    right = ev.select(
        "user_id", F.col("event_id").alias("b_id"), us.alias("b_us"), minute.alias("bucket")
    )
    pairs = (
        left.join(right, ["user_id", "bucket"])
        .filter(
            (F.col("a_id") != F.col("b_id"))
            & (F.abs(F.col("a_us") - F.col("b_us")) <= 60_000_000)
        )
        .select(
            "user_id",
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        )
        .distinct()
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_close_pairs"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# q48 — null-handling battery
# --------------------------------------------------------------------------
@query(
    "q48_null_battery",
    oracle="""
    SELECT
        COUNT(*) AS n,
        COUNT(maybe) AS n_not_null,
        CAST(SUM(CASE WHEN maybe IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        CAST(SUM(CAST(COALESCE(maybe, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_coalesced,
        CAST(SUM(CAST(CASE WHEN maybe = 0.0 THEN NULL ELSE maybe END IS NULL AS INT)) AS BIGINT)
            AS n_nullif_zero
    FROM (
        SELECT CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS maybe
        FROM events
    )
    """,
)
def q48_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    maybe = F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("value"))
    src = ev.select(maybe.alias("maybe"))
    return src.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("maybe").alias("n_not_null"),
        F.sum(F.when(F.col("maybe").isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.coalesce(F.col("maybe"), F.lit(0.0)).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_coalesced"),
        F.sum(F.nullif(F.col("maybe"), F.lit(0.0)).isNull().cast("int")).alias("n_nullif_zero"),
    )


# --------------------------------------------------------------------------
# q49 — date/time arithmetic battery (portable subset)
# --------------------------------------------------------------------------
@query(
    "q49_date_battery",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS y,
           CAST(EXTRACT(month FROM l_shipdate) AS INT) AS m,
           date_trunc('month', l_shipdate) AS month_start,
           last_day(CAST(l_shipdate AS DATE)) AS month_end,
           CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS INT)
               AS days_since_epoch_start,
           CAST((EXTRACT(dow FROM l_shipdate) + 1) AS INT) AS dow_sunday1,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-03-01'
    GROUP BY ALL
    ORDER BY days_since_epoch_start
    """,
)
def q49_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-03-01").cast("timestamp")
    )
    return (
        li.select(
            F.year("l_shipdate").alias("y"),
            F.month("l_shipdate").alias("m"),
            F.date_trunc("month", "l_shipdate").alias("month_start"),
            F.last_day("l_shipdate").alias("month_end"),
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
                "days_since_epoch_start"
            ),
            F.dayofweek("l_shipdate").alias("dow_sunday1"),
        )
        .groupBy("y", "m", "month_start", "month_end", "days_since_epoch_start", "dow_sunday1")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("days_since_epoch_start")
    )


# --------------------------------------------------------------------------
# q69 — correlated scalar subquery (Catalyst decorrelates to a join)
# --------------------------------------------------------------------------
_Q69_SQL = """
    SELECT p.p_partkey, p.p_type, p.p_retailprice,
           round(CAST((SELECT AVG(p2.p_retailprice) FROM part p2
                 WHERE p2.p_type = p.p_type) AS DOUBLE), 6) AS type_avg
    FROM part p
    WHERE p.p_retailprice > 1.02 * (SELECT AVG(p3.p_retailprice) FROM part p3
                                    WHERE p3.p_type = p.p_type)
    ORDER BY p.p_partkey
"""


@query("q69_scalar_subquery", oracle=_Q69_SQL)
def q69_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_integ_data_pipeline_spark.sources.fixtures import register_views

    register_views(spark, sf_dir, tables=("part",))
    return spark.sql(_Q69_SQL)


# --------------------------------------------------------------------------
# q88 — statistics battery (corr / stddev / covariance per group).
# Spark's corr()/stddev() stream doubles in partition order, so their
# low bits differ from DuckDB's sequential pass. Both engines get the
# IDENTICAL result here by computing the raw moments (n, Σx, Σy, Σxy,
# Σx², Σy²) as exact DECIMAL sums and deriving the statistics with the
# same double expression tree — every operation is then an IEEE
# correctly-rounded function of identical inputs.
#
# The inputs must be cast to DECIMAL *before* multiplying: casting the
# double PRODUCT (e.g. price²) rounds an arbitrary double to scale 4,
# and the engines implement that conversion differently (exact
# BigDecimal vs scaled-double), which showed up as a 1-ULP corr
# mismatch. The raw columns are 2-decimal-clean (verified: max
# |v·100 − round(v·100)| ≤ 1e-9 over the fixture), so DECIMAL(18,2)
# casts are exact and every product/sum after them is exact integer
# arithmetic in both engines. Same map-side-combine shuffle shape as
# any groupBy; the moment trick costs nothing.
#
# Derived statistics are reported at 10 dp (round() in both engines):
# the moments are identical, but each engine's DECIMAL→DOUBLE cast of
# the huge Σxy/Σx²/Σy² decimals is separately rounded and can differ
# in the last bit, which surfaced as a 1-ULP corr mismatch at
# sf0.001. 10 dp is far inside double precision for these magnitudes
# and matches the q54 round-before-compare contract.
# --------------------------------------------------------------------------
_MOM = {
    "n": "COUNT(*)",
    "sx": "CAST(SUM(x) AS DOUBLE)",
    "sy": "CAST(SUM(y) AS DOUBLE)",
    "sxy": "CAST(SUM(x * y) AS DOUBLE)",
    "sxx": "CAST(SUM(x * x) AS DOUBLE)",
    "syy": "CAST(SUM(y * y) AS DOUBLE)",
}


@query(
    "q88_stats_moments",
    oracle=f"""
    SELECT l_returnflag,
           n,
           round(sx / n, 10) AS mean_qty,
           round((sxx - sx * sx / n) / (n - 1), 10) AS var_qty,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 10) AS stddev_qty,
           round((sxy - sx * sy / n) / (n - 1), 10) + 0 AS covar_qty_price,
           round((sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 10) + 0 AS corr_qty_price
    FROM (
        SELECT l_returnflag,
               {_MOM['n']} AS n, {_MOM['sx']} AS sx, {_MOM['sy']} AS sy,
               {_MOM['sxy']} AS sxy, {_MOM['sxx']} AS sxx, {_MOM['syy']} AS syy
        FROM (SELECT l_returnflag,
                     CAST(l_quantity AS DECIMAL(18,2)) AS x,
                     CAST(l_extendedprice AS DECIMAL(18,2)) AS y
              FROM lineitem)
        GROUP BY l_returnflag
    )
    ORDER BY l_returnflag
    """,
)
def q88_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    base = l.select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("x"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    mom = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return mom.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 10).alias("mean_qty"),
        F.round((sxx - sx * sx / n) / (n - 1), 10).alias("var_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 10).alias("stddev_qty"),
        # + 0.0 normalizes IEEE -0.0: DuckDB's ROUND keeps the sign of a
        # tiny-negative pre-image, Spark's BigDecimal round drops it —
        # numerically equal, hash-different (the q126 round-5 lesson).
        (F.round((sxy - sx * sy / n) / (n - 1), 10) + F.lit(0.0)).alias("covar_qty_price"),
        (
            F.round(
                (sxy - sx * sy / n)
                / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
                10,
            )
            + F.lit(0.0)
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# q149 — error-safe expression battery (try_cast / try_divide /
# try_add / try_to_timestamp): the ANSI-mode survival kit — malformed
# feed values become NULLs instead of failed 100 TB jobs. The oracle
# spells out the SQL-standard equivalents (TRY_CAST, NULLIF guards,
# overflow CASE bounds), so the null semantics — not just the happy
# path — are hash-checked.
# --------------------------------------------------------------------------
_Q149_ROWS = [
    ("42", 10.0, 2.0, 9223372036854775807, 1, "2024-01-02 03:04:05"),
    ("x7", 1.0, 0.0, 100, 200, "not-a-time"),
    ("-3", -7.5, 0.5, -9223372036854775808, -1, "2024-12-31 23:59:59"),
    (None, 5.0, None, 9000000000000000000, 9000000000000000000, None),
]


@query(
    "q149_try_expr_battery",
    oracle="""
    WITH v(s_int, num, den, a, b, ts) AS (
        VALUES ('42', 10.0, 2.0, 9223372036854775807, CAST(1 AS BIGINT),
                '2024-01-02 03:04:05'),
               ('x7', 1.0, 0.0, CAST(100 AS BIGINT), CAST(200 AS BIGINT),
                'not-a-time'),
               ('-3', -7.5, 0.5, -9223372036854775808, CAST(-1 AS BIGINT),
                '2024-12-31 23:59:59'),
               (NULL, 5.0, NULL, 9000000000000000000, 9000000000000000000, NULL)
    )
    SELECT s_int,
           TRY_CAST(s_int AS INTEGER) AS i,
           num / NULLIF(den, 0) AS q,
           CASE WHEN (b > 0 AND a > 9223372036854775807 - b)
                  OR (b < 0 AND a < -9223372036854775808 - b)
                THEN NULL ELSE a + b END AS s,
           TRY_CAST(ts AS TIMESTAMP) AS t
    FROM v ORDER BY s_int NULLS FIRST
    """,
)
def q149_try_expr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's try_* family over a fixture covering the failure modes:
    unparsable casts, divide-by-zero, bigint overflow in BOTH
    directions, garbage timestamps, null propagation. Completes the
    cast battery (q33/q48): those prove conversions work; this proves
    the ERROR PATHS degrade to null identically to the SQL-standard
    guards an ANSI engine would write."""
    df = spark.createDataFrame(
        _Q149_ROWS, "s_int string, num double, den double, a long, b long, ts string"
    )
    return df.selectExpr(
        "s_int",
        "try_cast(s_int as int) as i",
        "try_divide(num, den) as q",
        "try_add(a, b) as s",
        "try_to_timestamp(ts) as t",
    ).orderBy(F.col("s_int").asc_nulls_first())
