"""Loaders for the driver star-schema fixtures (TESTDATA.md).

Tables live as single parquet files under ``{sf_dir}/{name}.parquet``.
``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
reader rejects outright; with ``spark.sql.legacy.parquet.nanosAsLong``
it surfaces as a nanosecond LongType, which we truncate to
microseconds — exactly what DuckDB's TIMESTAMP (µs) does — so both
engines see identical values.
"""

from __future__ import annotations

import os

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
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
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
    return _spread_unsplittable_scan(spark, df, path, name)


def _spread_unsplittable_scan(
    spark: SparkSession, df: DataFrame, path: str, name: str
) -> DataFrame:
    """Round-15 (guide §2.5 input skew): the fixture tables are single
    row-group parquet FILES, so the scan is ONE task and every
    row-local transform before the first exchange — shingle explodes,
    char-gram generation, tokenization — runs serially regardless of
    core count (measured: q175's shingle+freq stage was a single
    894 ms task on 32 idle cores). The guide's remedy for unsplittable
    inputs is to repartition immediately after the read; this helper
    applies it ONLY when the whole input fits in one scan split (file
    size ≤ spark.sql.files.maxPartitionBytes), i.e. exactly the case
    where the scan cannot parallelize itself and the redistribution
    shuffle is bounded by ONE split of data — at production scale
    inputs span many splits/files and this is a no-op. The partition
    count follows the session's scheduling parallelism, the same
    scale-adaptive source the shuffle-partition default uses.

    Every registered query's graded output is partition-layout
    independent (exact/decimal aggregates, deterministic folds for the
    float-graded keys, keyed winner rules — the r4–r6 hardening), so
    spreading the scan changes wall-clock only; the full 3-SF oracle
    differential re-proves this on the final round-16 code.

    Round 16: the spread is CONSUMER-OPT-IN via the session conf
    ``spark.tp_integ.spreadCorpusScan`` (set per query by
    plans/registry.apply_query_confs).  Round 15 applied it to every
    corpus consumer and the frozen-control comparison showed the
    exchange is a net loss for consumers whose map work is light
    (q240/q164/q239/q237/q158/q200 et al — the r15 VERDICT's 31-key
    tail); only the gram/shingle/token-explode families keep it."""
    try:
        if name not in _SPREAD_TABLES:
            return df
        if spark.conf.get("spark.tp_integ.spreadCorpusScan", "false") != "true":
            return df
        size = os.path.getsize(path)
        max_split = int(
            _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
        )
        # lower bound: spreading a dim-sized table (region, nation,
        # supplier) would ADD a 32-task wave to every consumer for no
        # map-side work worth parallelizing; those stay single-task
        # (and keep their broadcast-build cost at one partition).
        if size > max_split or size < _SPREAD_MIN_BYTES:
            return df
        # FIXED partition count, not defaultParallelism: the spread
        # changes which rows fold together in first-level float
        # partials, so the layout must be a pure function of the file
        # (the r4 determinism lesson — q173's ROUND(AVG) flipped one
        # ULP when the layout followed core count). Round-robin from a
        # single-split scan is deterministic (file order in, fixed
        # cycle out, sortBeforeRepartition pinning retries), so a
        # constant count makes every downstream fold identical on any
        # machine/core count. 32 matches the bench box; override via
        # SPARK_GRAFT_SPREAD_PARTITIONS for other deployments.
        return df.repartition(_SPREAD_PARTITIONS)
    except Exception as exc:  # pragma: no cover - conservative fallback
        # A silently-disabled spread looks exactly like a performance
        # regression (r15 ADVICE): make the fallback visible once.
        global _SPREAD_FALLBACK_WARNED
        if not _SPREAD_FALLBACK_WARNED:
            _SPREAD_FALLBACK_WARNED = True
            print(f"[fixtures] corpus-scan spread disabled: {exc!r}")
        return df


# The spread is worth paying ONLY where consumers are uniformly
# row-local-compute-heavy — the unstructured corpora, whose every
# consumer explodes text into grams/shingles/tokens or folds vectors
# (documents: q41/q42/q56/q57/q105–q113/q153/q193/q195/q198/…;
# embeddings: the similarity family). Measured both directions at
# sf0.1:
#   * documents consumers: q57 4.3→1.0 s, q56 4.2→1.8 s,
#     q198 2.6→0.6 s, q41 3.0→1.1 s, q113 2.9→1.4 s (A/B, min-of-2);
#   * relational facts (lineitem/orders/events) REGRESSED when spread
#     — their consumers aggregate/sketch in the scan stage with light
#     map work, so the extra full-table exchange only costs (q202
#     1.9→4.4 s, q124 4.8→8.2 s, q138 2.6→4.1 s, q171 1.5→2.9 s
#     across the two bench passes that tried it), exactly like the
#     dim-fed linkage family (q145 1.6→2.2 s, q176 2.4→3.6 s when
#     part/customer were spread).
# So the spread is an allowlist of the corpus tables plus size gates;
# everything else keeps the plain scan.
_SPREAD_TABLES = {"documents", "embeddings"}
_SPREAD_MIN_BYTES = 512 * 1024

# Deterministic spread width (see _spread_unsplittable_scan): constant
# so the fold layout never follows the environment. NOTE (r15 ADVICE):
# overriding this voids the float-fold stability guarantee for any
# output graded through first-level float partials — graded runs must
# use the default; the override exists for foreign-deployment tuning
# only.
_SPREAD_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SPREAD_PARTITIONS", "32"))

_SPREAD_FALLBACK_WARNED = False


def _parse_bytes(v: str) -> int:
    """Spark size-string → bytes. Handles Spark's own renderings too:
    a bare trailing 'b' ('134217728b' — returned when the conf was set
    explicitly) and t/p units (r15 ADVICE)."""
    v = v.strip().lower()
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4, "p": 1024**5}
    for suffix, mult in units.items():
        if v.endswith(suffix + "b"):
            return int(float(v[:-2]) * mult)
        if v.endswith(suffix):
            return int(float(v[:-1]) * mult)
    if v.endswith("b"):
        return int(float(v[:-1]))
    return int(v)


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
