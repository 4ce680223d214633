"""Skew-mitigation operators for 100 TB-scale shuffles.

AQE (spark.sql.adaptive.skewJoin, on in our session) handles skewed
sort-merge joins at runtime; this module adds the *algorithmic* salting
patterns AQE cannot do:

- `salted_agg`: two-phase aggregation for skewed group keys — phase 1
  aggregates on (key, salt) spreading a hot key over N reducers,
  phase 2 re-aggregates per key. Works for any algebraic aggregate
  (sum/count/min/max — pass the re-combine expressions).
- `salted_broadcast_left`: replicate the broadcast side N× and salt
  the fact side — for hot join keys when the dim is small but AQE's
  split is unavailable (e.g. streaming joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    `partial_aggs` aggregate within (keys, salt); `final_aggs`
    re-combine the partials per key (e.g. partial `sum(x) AS s` →
    final `sum(s) AS s`). The salt is derived from a uniformly
    distributed source column when given (deterministic), else from a
    per-row random — both spread a hot key across `n_salts` reducers.
    """
    salt = (
        (F.xxhash64(F.col(salt_source)) % n_salts)
        if salt_source
        else (F.rand() * n_salts).cast("int")
    )
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Left join with the dim replicated across n_salts and the fact
    side salted — every reducer sees 1/n of the hot key's rows."""
    salted_fact = fact.withColumn("__salt", (F.rand() * n_salts).cast("int"))
    replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (salted_fact[fact_key] == replicated[dim_key]) & (
        salted_fact["__salt"] == replicated["__salt"]
    )
    return salted_fact.join(F.broadcast(replicated), cond, "left").drop("__salt")
