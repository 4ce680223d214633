"""Session-scoped relation cache for EXPENSIVE prework shared by
several registered queries over the same corpus (ordered token sets
for prefix joins, MinHash-LSH pair relations, duplicate clusters).

Semantics: one lazily-checkpointed DataFrame per
(applicationId, *key); entries from dead sessions are evicted on the
next insert so a long-lived process never accumulates unreachable
checkpointed RDD references. Caching is an in-process wall-time
optimization only — every consumer still expresses the full logical
plan, so correctness (and the DuckDB oracle differential) is
unaffected; at cluster scale the same role is played by materializing
the shared relation once per pipeline run."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHES: dict[str, dict[tuple, DataFrame]] = {}


def session_cached(
    spark: SparkSession,
    cache_name: str,
    key: tuple,
    build: Callable[[], DataFrame],
) -> DataFrame:
    app = spark.sparkContext.applicationId
    cache = _CACHES.setdefault(cache_name, {})
    full = (app, *key)
    cached = cache.get(full)
    if cached is not None:
        return cached
    # sweep EVERY cache name for dead-session entries, not just the one
    # being inserted into — otherwise checkpointed DataFrames keyed
    # under other names pin memory for the process lifetime (r8 ADVICE)
    for c in _CACHES.values():
        for stale in [k for k in c if k[0] != app]:
            del c[stale]
    val = build()
    cache[full] = val
    return val
