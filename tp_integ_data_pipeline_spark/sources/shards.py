"""Training-shard writer: the sink-side counterpart of the q96 shard
assignment — materialize a curated corpus as N content-addressed
parquet shards, each internally sorted, sized for training loaders.

Scale shape (100 TB design point):

* Shard id is a content hash (md5 of the key), NOT a random or
  round-robin assignment: re-running the writer over the same corpus
  — or over the corpus plus an increment — routes every document to
  the same shard, so downstream loaders can cache/diff per shard.
* `repartition(n_shards, shard)` is the only shuffle; the per-shard
  sort happens map-side within the already-shuffled partition
  (`sortWithinPartitions`), and `partitionBy(shard)` then splits
  files without a second exchange.
* `maxRecordsPerFile` bounds individual file size so a hot shard
  splits into multiple loader-friendly files instead of one huge one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_id(key_col: str, n_shards: int) -> F.Column:
    """Content-stable shard in [0, n_shards): first two hex digits of
    md5(key) mod n_shards — same digits q76/q96 use, so a doc's shard
    agrees with its split/audit rows across the whole pipeline."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 2), 16, 10).cast("int"),
        F.lit(n_shards),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    n_shards: int = 16,
    sort_col: str | None = None,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write ``df`` as ``path/shard=K/*.parquet``, one directory per
    content-hash shard, rows sorted by ``sort_col`` (default: the key)
    inside each shard. One shuffle total."""
    sort_col = sort_col or key_col
    out = df.withColumn("shard", shard_id(key_col, n_shards))
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", sort_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """Read one shard via partition pruning (no full scan)."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)
