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


def _row_salt(df: DataFrame, n_salts: int, salt_source: str | None = None) -> Column:
    """Deterministic per-row salt in [0, n_salts).

    `F.rand()` as a shuffle/group/join key is unsafe at scale: on
    fetch-failure recomputation a re-executed map task re-draws salts,
    so rows can be double-counted or lost (the same hazard that forced
    Spark to sort before round-robin repartition — routine with retries
    on a 1000-executor cluster). Hashing the row content (or a
    designated source column) is stable across retries. `pmod`, not
    `%`: xxhash64 is signed and Spark's `%` keeps the dividend's sign,
    which would emit salts outside [0, n_salts).
    """
    src = [F.col(salt_source)] if salt_source else [F.col(c) for c in df.columns]
    return F.pmod(F.xxhash64(*src), F.lit(n_salts))


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
    final `sum(s) AS s`). The salt hashes a uniformly distributed
    source column when given, else the whole row — both spread a hot
    key across `n_salts` reducers, deterministically under task retry.
    (Fully duplicate rows share a salt; aggregation stays correct, the
    spread just needs any varying column.)
    """
    salt = _row_salt(df, n_salts, salt_source)
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Left join with the dim replicated across n_salts and the fact
    side salted — every reducer sees 1/n of the hot key's rows.

    The default whole-row content salt is retry-stable (see _row_salt)
    but gives BYTE-IDENTICAL fact rows the same salt — a duplicate-heavy
    hot key (many identical events) would then see zero spread,
    reinstating the skew. Such callers must pass ``salt_source`` naming
    a column that varies across those duplicates (an offset/ingest-id),
    same escape hatch as `salted_agg`.
    """
    salted_fact = fact.withColumn("__salt", _row_salt(fact, n_salts, salt_source))
    replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (salted_fact[fact_key] == replicated[dim_key]) & (
        salted_fact["__salt"] == replicated["__salt"]
    )
    return salted_fact.join(F.broadcast(replicated), cond, "left").drop("__salt")


def skew_report(df: DataFrame, keys: list[str], top: int = 20) -> DataFrame:
    """Per-key frequency of the ``top`` heaviest join keys plus their
    share of the table — the diagnosis a pipeline runs BEFORE choosing
    a join strategy (broadcast / salt / AQE split). One keyed
    aggregate + a 1-row total broadcast; top-k via orderBy().limit()
    (TakeOrderedAndProject, never a global window)."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-mitigated SHUFFLE equi-join — the non-broadcast sibling of
    :func:`salted_broadcast_left`, for the moderate dim that exceeds
    broadcast range but is far smaller than the fact. Fact rows get
    the retry-stable content salt (see ``_row_salt``); the dim side is
    replicated once per salt via a row-local explode; the join keys
    become (keys..., salt), spreading a hot fact key over ``n_salts``
    reducers at the cost of an n_salts× dim shuffle. Row multiplicity
    is exactly preserved (each fact row matches the single replica
    carrying its salt), so the result is IDENTICAL to the unsalted
    join — which is what the q154 oracle checks. ``how`` supports the
    fact-preserving shapes (inner/left); right/outer would need
    dim-side salting instead."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_fact = fact.withColumn(
        "__salt", _row_salt(fact, n_salts, salt_source).cast("int")
    )
    # sequence(int, int) is array<int>, so the exploded salt is already
    # int-typed to match the cast fact salt (no cast around explode —
    # generators cannot nest in expressions)
    salted_dim = dim.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt"),
        "*",
    )
    return salted_fact.join(salted_dim, [*keys, "__salt"], how).drop("__salt")
