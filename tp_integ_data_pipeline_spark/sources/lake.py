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

    def read(
        self,
        table: str,
        merge_schema: bool = False,
        tolerate_corrupt: bool = False,
    ) -> DataFrame | None:
        """S1/S2: read a (possibly hive-partitioned) lake table; `None`
        when absent/empty — mirroring leer_parq's None contract
        (main.py:71-75).

        ``merge_schema`` reconciles files written under EVOLVED schemas
        (columns added over the table's life) into the union schema,
        null-filling older files — the read-side half of P5's
        align_to_schema. ``tolerate_corrupt`` skips unreadable files
        instead of failing the scan (a 100 TB landing zone always has
        a torn upload somewhere; losing one file beats losing the
        query). Both default OFF: silent skipping/widening is a policy
        the caller must opt into, not a default."""
        if not self.exists(table):
            return None
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        if tolerate_corrupt:
            reader = reader.option("ignoreCorruptFiles", "true")
        return reader.parquet(self._path(table))

    def _dedup_against_existing(
        self,
        df: DataFrame,
        existing: DataFrame,
        dedup_keys: list[str],
        partition_cols: list[str] | None = None,
    ) -> DataFrame:
        """Anti-join `df` against the existing lake, probing ONLY the
        hive partitions the incoming batch touches.

        An unrestricted probe rescans the ENTIRE lake per append —
        O(lake) read amplification, inherited from the reference's
        full re-read (main.py:101-107); at 100 TB each 900 s
        micro-batch would rescan everything. Because the partition key
        is derived from the dedup key (fecha_partic =
        date_format(time), main.py:213), a duplicate can only live in
        a partition the batch itself maps to, so restricting the probe
        to the batch's partition values is exact. The distinct
        partition tuples are collected driver-side — bounded by the
        handful of partitions one micro-batch spans, and pushed back
        as a PartitionFilters-able predicate (Delta-style file
        skipping on plain parquet). Callers whose dedup keys do NOT
        determine the partition value must pass partition_cols=None to
        probe the full lake.
        """
        probe = existing
        if partition_cols:
            combos = df.select(*partition_cols).distinct().collect()
            if combos:
                disjuncts = []
                for row in combos:
                    conj = F.lit(True)
                    for k in partition_cols:
                        # eqNullSafe: a NULL partition value must still
                        # probe the lake's null partition
                        # (__HIVE_DEFAULT_PARTITION__); plain == yields
                        # NULL there and would skip it, re-appending
                        # null-keyed duplicates.
                        conj = conj & F.col(k).eqNullSafe(F.lit(row[k]))
                    disjuncts.append(conj)
                cond = disjuncts[0]
                for d in disjuncts[1:]:
                    cond = cond | d
                probe = existing.filter(cond)
        # Null-safe anti-join: dedup must treat NULL key components as
        # equal (SQL DISTINCT semantics) — a plain equi-join's NULL ≠
        # NULL would re-append every null-keyed re-delivery forever.
        # eqNullSafe still plans as a hash join (EqualNullSafe is an
        # equi-join key), so this costs nothing vs `on=dedup_keys`.
        probe_keys = probe.select(*dedup_keys).distinct().alias("__probe")
        incoming = df.alias("__in")
        cond = F.lit(True)
        for k in dedup_keys:
            cond = cond & F.col(f"__in.{k}").eqNullSafe(F.col(f"__probe.{k}"))
        return incoming.join(probe_keys, cond, "left_anti")

    def write_incremental(
        self,
        table: str,
        df: DataFrame,
        partition_cols: list[str],
        dedup_keys: list[str],
        probe_partitions: bool | None = None,
    ) -> None:
        """S6: partitioned incremental append with dedup-before-write.

        Reference semantics (main.py:101-114): skip rows whose key
        already exists. Implemented as a left_anti join against the
        existing lake — per-row (strictly more precise than the
        reference's last-`time`-only scalar check, which its
        append-only source made equivalent).

        Partition-pruning the dedup probe is only EXACT when the dedup
        keys determine the partition value (otherwise a re-delivered
        key arriving under a different partition value would probe the
        wrong partition and append a silent duplicate):

        - ``probe_partitions=None`` (default): prune only when every
          partition column is itself a dedup key — the one case the
          dependency holds structurally.
        - ``True``: caller asserts dedup_keys → partition functional
          dependency (e.g. the reference's ``fecha_partic =
          date_format(time)``, main.py:213) and opts into the
          O(batch-partitions) probe.
        - ``False``: always probe the full lake.
        """
        existing = self.read(table)
        if existing is not None:
            if probe_partitions is None:
                probe_partitions = set(partition_cols) <= set(dedup_keys)
            df = self._dedup_against_existing(
                df, existing, dedup_keys, partition_cols if probe_partitions else None
            )
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


    def compact(
        self, table: str, target_partitions: int = 1, zorder_cols: list[str] | None = None
    ) -> None:
        """Small-files compaction: rewrite the table to
        `target_partitions` files per hive partition (incremental
        appends leave one file-set per micro-batch — at 100 TB the
        file count, not the byte count, kills scan planning).
        Copy-on-write: rewrite to a fresh dir, then swap.

        `zorder_cols` additionally clusters rows on the interleaved
        z-value during the rewrite (operators/layout.py), so the
        compacted files carry tight parquet min/max envelopes on every
        listed column — compaction and OPTIMIZE ZORDER in one pass,
        like Delta's."""
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
        if zorder_cols:
            from tp_integ_data_pipeline_spark.operators.layout import zorder_dataframe

            writer = zorder_dataframe(current, zorder_cols, target_partitions)
        elif partition_cols:
            writer = current.repartition(target_partitions, *partition_cols)
        else:
            writer = current.coalesce(target_partitions)
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
