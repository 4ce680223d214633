"""Loaders for the driver star-schema fixtures (TESTDATA.md).

Tables live as single parquet files under ``{sf_dir}/{name}.parquet``.
``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
reader rejects outright; with ``spark.sql.legacy.parquet.nanosAsLong``
it surfaces as a nanosecond LongType, which we truncate to
microseconds — exactly what DuckDB's TIMESTAMP (µs) does — so both
engines see identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes events.ts to TimestampType."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    ts_type = dict(df.dtypes).get("ts") if name == "events" else None
    if ts_type == "bigint":
        # ns → µs integer division (`div`, not `/`: double would lose
        # precision at 1e18 ns); values are post-1970 so div == floor.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Newer Spark reads TIMESTAMP(NANOS) as µs-truncated NTZ even
        # with the legacy conf; session TZ is UTC, so reinterpreting as
        # an instant yields the same values the bigint path produced —
        # one stable events schema across Spark minor versions.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=FIXTURE_TABLES) -> None:
    """Register each fixture table as a temp view for spark.sql use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def scratch_dir(prefix: str) -> str:
    """Query-lifetime scratch directory: mkdtemp plus an atexit
    cleanup, so repeated bench/correctness runs don't accumulate
    unbounded /tmp state (lazy DataFrames over the dir stay readable
    for the life of the process, which is exactly the window the
    registry queries need)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
