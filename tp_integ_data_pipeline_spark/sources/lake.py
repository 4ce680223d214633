"""Parquet data-lake layer (SURVEY.md §2.1 S1/S2/S6/S7).

Re-expresses the reference's `DataLake` (main.py:20-150):

- hive-partitioned fact landing (`partition_cols=['fecha_partic']`,
  main.py:93-114) → `partitionBy` writes + partition-pruned reads;
- unpartitioned dimension landing (main.py:41,142-147);
- dedup-before-write: the reference re-reads the whole lake and
  compares scalars / membership lists (main.py:101-107, 127-133) — at
  scale that is O(lake) per write; the engine uses `left_anti` joins
  (and documents the reference's batch-skip policies as options).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DataLake:
    """Partition-aware parquet lake rooted at `root`."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self._path(table)
        if not os.path.isdir(p):
            return False
        for _, _, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self, table: str) -> DataFrame | None:
        """S1/S2: read a (possibly hive-partitioned) lake table; `None`
        when absent/empty — mirroring leer_parq's None contract
        (main.py:71-75)."""
        if not self.exists(table):
            return None
        return self.spark.read.parquet(self._path(table))

    def write_incremental(
        self, table: str, df: DataFrame, partition_cols: list[str], dedup_keys: list[str]
    ) -> None:
        """S6: partitioned incremental append with dedup-before-write.

        Reference semantics (main.py:101-114): skip rows whose key
        already exists. Implemented as a left_anti join against the
        existing lake — per-row (strictly more precise than the
        reference's last-`time`-only scalar check, which its
        append-only source made equivalent).
        """
        existing = self.read(table)
        if existing is not None:
            df = df.join(existing.select(*dedup_keys).distinct(), dedup_keys, "left_anti")
        df.write.mode("append").partitionBy(*partition_cols).parquet(self._path(table))

    def write_full(
        self, table: str, df: DataFrame, dedup_keys: list[str], batch_skip: bool = False
    ) -> None:
        """S7: unpartitioned append with key-set dedup.

        `batch_skip=True` reproduces the reference's policy verbatim
        (main.py:127-133: if ANY id already present, skip the whole
        batch); default is the per-row anti-join improvement.
        """
        existing = self.read(table)
        if existing is not None:
            if batch_skip:
                overlap = df.join(
                    existing.select(*dedup_keys).distinct(), dedup_keys, "left_semi"
                ).limit(1)
                if len(overlap.take(1)) > 0:
                    return
            else:
                df = df.join(existing.select(*dedup_keys).distinct(), dedup_keys, "left_anti")
        df.write.mode("append").parquet(self._path(table))


    def compact(self, table: str, target_partitions: int = 1) -> None:
        """Small-files compaction: rewrite the table to
        `target_partitions` files per hive partition (incremental
        appends leave one file-set per micro-batch — at 100 TB the
        file count, not the byte count, kills scan planning).
        Copy-on-write: rewrite to a fresh dir, then swap."""
        import shutil
        import tempfile

        current = self.read(table)
        if current is None:
            return
        partition_cols = [
            f.name
            for f in current.schema.fields
            if f.name in self._partition_dirs(table)
        ]
        staging = tempfile.mkdtemp(prefix=f"compact_{table}_")
        writer = current.repartition(target_partitions, *partition_cols) if partition_cols else current.coalesce(target_partitions)
        w = writer.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(staging)
        live = self._path(table)
        backup = live + ".old"
        shutil.move(live, backup)
        shutil.move(staging, live)
        shutil.rmtree(backup)

    def _partition_dirs(self, table: str) -> set[str]:
        """Partition column names inferred from hive-style dir names."""
        cols: set[str] = set()
        for dirpath, dirnames, _files in os.walk(self._path(table)):
            for d in dirnames:
                if "=" in d:
                    cols.add(d.split("=", 1)[0])
        return cols
