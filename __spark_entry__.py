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


# The driver's correctness run records exactly the FIRST 50 dict
# entries. Rotate the queries whose driver evidence is STALEST to the
# front so the capped run re-validates them on current code; combined
# with earlier rounds, every query then has hard signal. Round 4
# priority order: (a) q100–q131 — the round-3/4-new operators with
# ZERO driver-file signal yet (judge/local-sweep-verified only);
# (b) q42/q87 — r3-validated but their candidate generation changed
# in round 4 (hot-bucket salting is now the default, the signature
# relation is lazily checkpointed); (c) the CORRECTNESS_r02 key set,
# whose signal is oldest otherwise. (a)+(b)+(c) exceeds the 50-slot
# cap, so some r2 keys sit this round out — chosen as the ones with
# the strongest OTHER current-code evidence (q26/q52 are rows-only
# with pytest property/recall tests; q04/q23-q25/q27/q28/q38/q39/
# q53-q54/q72-q76/q78-q85 are single-operator relational queries on
# code untouched since round 2, each also pytest-covered; q86/q93-q99
# have r2 hash-match signal plus dedicated pytest coverage, and
# q93/q97 run in the bench headline and every local check_oracle
# sweep).
# NEXT ROUND: rotate the CORRECTNESS_r01 key set back to the front
# (it will then be the stalest), plus the r2 keys benched out this
# round (q04 q23-q28 q38 q39 q45 q47-q49 q52-q54 q69 q72-q76 q78-q86
# q93-q99) and any round-5-new queries.
_ROTATE_FRONT = (
    "q126 q127 q128 q129 q130 q131 q132 q133 q134 q135 q136 q137 q138 q139 q140 q141 q142 q143 q144 q145 q146 q147 q148 q149 q150 q151 "
    "q100 q101 q102 q103 q104 q105 q106 q107 q108 q109 q110 q111 "
    "q112 q113 q114 q115 q116 q117 q118 q119 q120 q121 q122 q123 "
    "q124 q125 q42 q87 "
    "q90 q89 q91 q36 q37 q62 q63 q29 q92 q46 q88"
).split()


def _ordered_names() -> list[str]:
    first = [n for n in plans.QUERIES if n.split("_")[0] in _ROTATE_FRONT]
    rest = [n for n in plans.QUERIES if n.split("_")[0] not in _ROTATE_FRONT]
    return first + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(plans.QUERIES[name]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: plans.ORACLES[n] for n in _ordered_names() if n in plans.ORACLES}
