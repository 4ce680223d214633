"""Join operators (SURVEY.md §2.3).

The reference performs one join — a left equi-join enriching the fact
table from a tiny dimension (transf.py:94-99) — plus anti-join
*semantics* for dedup-before-write (main.py:101-133, hand-rolled as
scalar compares). The engine exposes the full `how` surface through
these thin, broadcast-aware wrappers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str] | None = None,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1: fact ⟕ dim with projection pushdown on the dim side.

    The reference manually projects the dim to 3 columns before the
    merge; Catalyst prunes automatically, but we keep the explicit
    projection as documentation of intent. Bounded dims are broadcast
    (no shuffle of the 100 TB fact side).
    """
    cols = dim_cols if dim_cols is not None else dim.columns
    if dim_key not in cols:
        cols = [dim_key, *cols]
    d = dim.select(*cols)
    if broadcast_dim:
        d = F.broadcast(d)
    return fact.join(d, fact[fact_key] == d[dim_key], how)


def anti_join(df: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """J2: rows of `df` whose key is NOT present in `existing`.

    This replaces the reference's driver-side membership list
    (`r in list(prev['id'])`, main.py:131 — the anti-pattern at scale)
    with a distributed left_anti join.
    """
    return df.join(existing.select(*keys).distinct(), keys, "left_anti")


def semi_join(df: DataFrame, other: DataFrame, keys: list[str]) -> DataFrame:
    """EXISTS semantics."""
    return df.join(other.select(*keys).distinct(), keys, "left_semi")
