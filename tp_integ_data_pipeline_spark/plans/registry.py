"""Registry wiring query callables to their DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 registers here; the driver
harness pulls ``QUERIES`` / ``ORACLES`` through ``__spark_entry__``.
Queries without an oracle entry (genuinely non-SQL-expressible ops:
approximate ANN, SimHash candidates, streaming-internal state) get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
