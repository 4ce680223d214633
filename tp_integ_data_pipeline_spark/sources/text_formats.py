"""Text interchange formats: JSONL corpus export/import and schema'd
CSV ingestion with malformed-row quarantine.

JSONL is the lingua franca between curation pipelines and trainers —
the corpus leaves Spark as compressed line-delimited JSON shards and
must round-trip bit-exactly. CSV is the classic landing format for
operational feeds; at 100 TB there WILL be malformed lines, and the
difference between PERMISSIVE-with-quarantine and FAILFAST is whether
one bad row costs a row or a job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    max_records_per_file: int | None = None,
) -> None:
    """Export as line-delimited JSON shards (the trainer handoff
    format). ``max_records_per_file`` bounds shard size the same way
    the parquet shard writer does; compression defaults to gzip (zstd
    when the JVM provides it — gzip is the always-available baseline).
    Column order and types survive the round-trip via read_jsonl's
    explicit schema."""
    w = df.write.mode("overwrite").option("compression", compression)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read a JSONL corpus with an EXPLICIT schema — never inference,
    which at 100 TB means a full extra pass over the data and a schema
    that drifts with whichever shard got sampled."""
    return spark.read.schema(schema).json(path)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Schema'd CSV ingestion returning (good_rows, quarantined_rows).

    PERMISSIVE mode with an explicit ``_corrupt_record`` column: rows
    that parse land in ``good`` with the declared types; rows that
    don't (wrong arity, type mismatch) come back verbatim in
    ``quarantine`` for offline triage — the landing-zone contract that
    neither drops bad data silently (DROPMALFORMED) nor fails the
    whole job on one torn line (FAILFAST)."""
    full_schema = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        # Spark requires the corrupt-column path to be materialized
        # (cached or otherwise) before filtering on it; a lazy
        # checkpoint keeps that contract without an eager cache.
        .localCheckpoint(eager=False)
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantine
