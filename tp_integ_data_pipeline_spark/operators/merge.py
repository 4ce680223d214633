"""Facade for the merge layer (SURVEY.md §2.8), split by concern:

- :mod:`.merge_ops` — MERGE end-state plans (SCD1/SCD2/insert-if-absent);
- :mod:`.table_store` — CAS-committed versioned/bucketed parquet tables,
  vacuum, time travel, merge-on-read deletes;
- :mod:`.change_feed` — table_changes version diff.

Import paths are stable: everything the layer exports (including the
commit-protocol internals tests exercise) re-exports here.
"""

from __future__ import annotations

from tp_integ_data_pipeline_spark.operators.change_feed import table_changes
from tp_integ_data_pipeline_spark.operators.merge_ops import (
    insert_if_absent,
    scd1_upsert,
    scd2_upsert,
)
from tp_integ_data_pipeline_spark.operators.table_store import (
    BucketedParquetTable,
    ConcurrentWriteError,
    VersionedParquetTable,
    _commit_history,
    _load_state,
    _manifest_frame,
    _try_commit,
    vacuum,
)

__all__ = [
    "BucketedParquetTable",
    "ConcurrentWriteError",
    "VersionedParquetTable",
    "insert_if_absent",
    "scd1_upsert",
    "scd2_upsert",
    "table_changes",
    "vacuum",
]
