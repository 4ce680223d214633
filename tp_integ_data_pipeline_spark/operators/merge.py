"""Upsert / MERGE operators (SURVEY.md §2.8 M1/M2).

The reference executes two server-side SQL MERGEs against PostgreSQL
(transf.py:215-273 SCD1 upsert; transf.py:329-362 insert-if-absent).
Delta Lake is not on this classpath, so the engine ships the
plain-Spark rewrite: MERGE end-state as an anti-join + unionByName
plan, materialized by versioned parquet overwrite
(`VersionedParquetTable`). Semantics parity:

- M1 SCD1: MATCHED → row takes ALL stage attribute values, audit cols
  `fecha_actualizacion_origen` = stage load date and
  `fecha_actualizacion` = merge date; NOT MATCHED → stage row
  inserted. The reference's `admin4 = stg.admin3` typo (transf.py:239)
  is a recorded deviation: we implement the correct column mapping.
- M2 insert-if-absent: MATCHED → no-op; NOT MATCHED → insert. Re-runs
  are idempotent (README.md:86).

Both are pure DataFrame plans (no collect); at 100 TB the rewrite cost
is the price of no transaction log — a real deployment would swap in
Delta MERGE, which shares the same logical semantics tested here.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scd1_upsert(
    target: DataFrame,
    stage: DataFrame,
    keys: list[str],
    merge_date=None,
    origin_date_col: str | None = None,
    audit_origin: str = "fecha_actualizacion_origen",
    audit_modified: str = "fecha_actualizacion",
) -> DataFrame:
    """M1: SCD Type-1 merge end-state.

    Rows = (target rows with no stage match, unchanged) ∪ (stage rows,
    carrying audit columns). Matching the reference, a matched row's
    `audit_origin` is overwritten with the stage load date ("origin" is
    really "last seen"), and `audit_modified` gets the merge date.
    """
    merge_date_col = F.lit(merge_date).cast("date") if merge_date is not None else F.current_date()
    untouched = target.join(stage.select(*keys).distinct(), keys, "left_anti")
    upserted = stage
    if origin_date_col is not None:
        upserted = upserted.withColumn(audit_origin, F.col(origin_date_col).cast("date"))
    upserted = upserted.withColumn(audit_modified, merge_date_col)
    for col in upserted.columns:
        if col not in untouched.columns:
            untouched = untouched.withColumn(col, F.lit(None).cast(dict(upserted.dtypes)[col]))
    return untouched.unionByName(upserted.select(*untouched.columns))


def insert_if_absent(target: DataFrame, stage: DataFrame, keys: list[str]) -> DataFrame:
    """M2: append stage rows whose key is absent from the target;
    matched rows DO NOTHING. Idempotent by construction."""
    fresh = stage.join(target.select(*keys).distinct(), keys, "left_anti")
    return target.unionByName(fresh.select(*target.columns))


class VersionedParquetTable:
    """MERGE-capable warehouse table on plain parquet.

    Spark cannot overwrite a parquet dir it is lazily reading, so each
    merge writes a NEW versioned directory and flips a tiny manifest —
    the same copy-on-write idea as a Delta commit, minus the log
    (documented limitation: no concurrent writers, full rewrite).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _manifest(self) -> str:
        return os.path.join(self.path, "_MANIFEST.json")

    def current_version_dir(self) -> str | None:
        if not os.path.exists(self._manifest()):
            return None
        with open(self._manifest()) as fh:
            return json.load(fh)["current"]

    def read(self) -> DataFrame | None:
        cur = self.current_version_dir()
        return self.spark.read.parquet(cur) if cur else None

    def overwrite(self, df: DataFrame) -> None:
        new_dir = os.path.join(self.path, f"v{time.time_ns()}")
        df.write.mode("overwrite").parquet(new_dir)
        with open(self._manifest(), "w") as fh:
            json.dump({"current": new_dir}, fh)

    def merge_scd1(self, stage: DataFrame, keys: list[str], **kwargs) -> None:
        # First write still routes through scd1_upsert (empty target) so
        # audit columns exist from version 1, like the reference's
        # CREATE TABLE with audit cols + first MERGE (transf.py:179-206).
        cur = self.read()
        target = cur if cur is not None else stage.limit(0)
        self.overwrite(scd1_upsert(target, stage, keys, **kwargs))

    def merge_insert_if_absent(self, stage: DataFrame, keys: list[str]) -> None:
        cur = self.read()
        self.overwrite(stage if cur is None else insert_if_absent(cur, stage, keys))
