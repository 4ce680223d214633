"""Time-series surface over the events table: regular-grid resampling
with gap fill + forward fill (the hypertable `time_bucket_gapfill` /
`locf` verb). No reference-repo counterpart — SURVEY.md §2.10
extension surface; q12 (lag gaps) detects holes, this one REPAIRS
them, which is what a model-features or monitoring pipeline actually
consumes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table

_BUCKET_S = 21600  # 6 h


@query(
    "q140_gapfill_resample",
    oracle=f"""
    WITH per AS (
        SELECT user_id,
               CAST(FLOOR(epoch(ts) / {_BUCKET_S}) AS BIGINT) AS bucket,
               COUNT(*) AS n_events, SUM(value) AS v
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
        FROM per GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, UNNEST(range(mn, mx + 1)) AS bucket FROM span
    ),
    joined AS (
        SELECT g.user_id, g.bucket,
               COALESCE(p.n_events, 0) AS n_events,
               p.v AS v
        FROM grid g LEFT JOIN per p USING (user_id, bucket)
    )
    SELECT user_id, bucket, n_events,
           CAST(v IS NULL AS INT) AS is_gap,
           ROUND(LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS v_filled
    FROM joined ORDER BY user_id, bucket
    """,
)
def q140_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 6-hour resample between each user's own first and last
    event, missing buckets materialized (gap fill) and their value
    carried forward (LOCF). Shape: ONE user/bucket rollup, a user-row
    span aggregate, the grid exploded row-locally from sequence() (it
    is output-sized — never a calendar cross join), one left join back,
    and the forward fill as a user-partitioned running last() — every
    stage keyed on user, no global window, no driver loop. Bucket ids
    come from floor(epoch/21600) so both engines bucket the identical
    doubles (timestamp micros are < 2^53, exact in double)."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.select(
            "user_id",
            F.floor(F.col("ts").cast("double") / _BUCKET_S).alias("bucket"),
            "value",
        )
        .groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("v"))
    )
    span = per.groupBy("user_id").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("bucket")
    )
    joined = grid.join(per, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "v",
    )
    w = W.partitionBy("user_id").orderBy("bucket").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        joined.select(
            "user_id",
            "bucket",
            "n_events",
            F.col("v").isNull().cast("int").alias("is_gap"),
            F.round(F.last("v", ignorenulls=True).over(w), 6).alias("v_filled"),
        )
        .orderBy("user_id", "bucket")
    )


@query(
    "q144_hierarchical_rollup",
    oracle="""
    SELECT CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS week,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q144_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain rollup chain: hourly partials → daily (from hourly,
    raw never rescanned) → weekly (from daily). The oracle computes
    weekly DIRECTLY from raw, so the hash-match proves the partial
    states re-aggregate exactly through two regrain steps — the
    materialized-rollup contract (finer grain is the only scan; every
    coarser grain is partial-state-sized work). Counts and decimal
    sums are the re-aggregable measures (the HLL q120 / histogram
    q133 pattern for the distinct/quantile analogues)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            F.floor(F.col("ts").cast("double") / 3600).alias("hour"),
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("hour", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    daily = (
        hourly.select(
            F.expr("hour div 24").alias("day"), "event_type", "n", "sv"
        )
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    weekly = (
        daily.select(F.expr("day div 7").alias("week"), "event_type", "n", "sv")
        .groupBy("week", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    return weekly.select(
        "week", "event_type", "n", F.col("sv").cast("double").alias("total_value")
    ).orderBy("week", "event_type")
