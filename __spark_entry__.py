"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (EP2-shape transform chain: scan →
  filter → derive → broadcast-join dims → group → sort) at sf0.001.
- ``queries()``: one callable per implemented operator from
  SURVEY.md §2 (registered in tp_integ_data_pipeline_spark.plans).
- ``oracle_sql()``: matching DuckDB SQL per query; non-SQL-expressible
  ops (xxhash-based SimHash candidates, approximate ANN) are omitted →
  rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tp_integ_data_pipeline_spark import plans  # noqa: E402
from tp_integ_data_pipeline_spark.session import tune_for_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    return plans.QUERIES["q00_flagship"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in plans.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(plans.ORACLES)
