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

_DEFAULT_BROADCAST_THRESHOLD = 10 * 1024 * 1024  # Spark's autoBroadcastJoinThreshold default


def _parse_size_bytes(value) -> int:
    """Parse a Spark size conf value ('10485760', '10MB', '-1') to bytes."""
    s = str(value).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
                      ("b", 1)):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    return int(float(s) * mult)


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's own size estimate for the frame's optimized plan.

    For parquet scans this is file-size based, so it tracks the actual
    data volume (scale factor) rather than a guess made at code-write
    time. Returns None when the estimate is unavailable.
    """
    try:
        return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return None


def maybe_broadcast(df: DataFrame, threshold_bytes: int | None = None) -> DataFrame:
    """Stats-gated broadcast hint.

    A hardcoded ``F.broadcast()`` on a table that grows with data volume
    is the classic 100×-scale defect: correct and fast at test SF,
    executor OOM at the 100 TB design point (a TPC-H ``customer`` at
    SF100k is terabytes). This helper consults Catalyst's size estimate
    for the plan and adds the hint only when the estimate fits under the
    session's ``spark.sql.autoBroadcastJoinThreshold`` (or an explicit
    byte threshold). Above the threshold — or when no estimate exists —
    it returns the frame unhinted and lets the planner/AQE pick
    SMJ/SHJ, which degrades gracefully instead of OOMing.

    Truly bounded dims (nation=25 rows, region=5, 1-row scalar
    aggregates) keep their explicit ``F.broadcast`` hints at call sites;
    this gate is for anything whose cardinality is data-dependent.
    """
    if threshold_bytes is None:
        try:
            raw = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
            threshold_bytes = _parse_size_bytes(raw)
        except Exception:
            threshold_bytes = _DEFAULT_BROADCAST_THRESHOLD
    if threshold_bytes <= 0:
        return df  # broadcast disabled session-wide
    size = plan_size_bytes(df)
    if size is None or size > threshold_bytes:
        return df
    return F.broadcast(df)


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str] | None = None,
    how: str = "left",
    broadcast_dim: bool | str = "auto",
) -> DataFrame:
    """J1: fact ⟕ dim with projection pushdown on the dim side.

    The reference manually projects the dim to 3 columns before the
    merge; Catalyst prunes automatically, but we keep the explicit
    projection as documentation of intent. ``broadcast_dim="auto"``
    (default) routes through the stats-gated :func:`maybe_broadcast`,
    so bounded dims broadcast (no shuffle of the 100 TB fact side) and
    oversized ones fall back to a shuffle join instead of OOMing.
    """
    cols = dim_cols if dim_cols is not None else dim.columns
    if dim_key not in cols:
        cols = [dim_key, *cols]
    d = dim.select(*cols)
    if broadcast_dim == "auto":
        d = maybe_broadcast(d)
    elif broadcast_dim:
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right
    row with right_ts <= left_ts per `on` key.

    Spark has no native as-of join; this is the single-pass union +
    carry-forward-window formulation — one shuffle on (on, ts), no
    range explosion, no per-group pandas (`merge_asof`) needed. At
    100 TB this beats bucketed range joins whenever both sides share
    the key partitioning. Right-side payload travels as one struct so
    `last(ignorenulls)` carries all columns atomically. Ties
    (right_ts == left_ts) match, with right rows sorting before left.
    Appends `asof_ts` + the requested right columns to left rows.
    """
    from pyspark.sql import Window as W

    payload = F.struct(F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols])
    r = right.select(*on, F.col(right_ts).alias("__t"), F.lit(0).alias("__side"), payload.alias("__r"))
    l_cols = left.columns
    l = left.select(*l_cols, F.col(left_ts).alias("__t"), F.lit(1).alias("__side")).withColumn(
        "__r", F.lit(None).cast(dict(r.dtypes)["__r"])
    )
    for c in l_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    unioned = l.select(*l_cols, "__t", "__side", "__r").unionByName(
        r.select(*l_cols, "__t", "__side", "__r")
    )
    # __r as final sort key: deterministic winner among right rows that
    # share (key, ts) — struct ordering is (ts, right_cols...).
    w = (
        W.partitionBy(*on)
        .orderBy("__t", "__side", "__r")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("__last", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *l_cols,
        F.col("__last.__ts").alias("asof_ts"),
        *[F.col(f"__last.{c}").alias(c) for c in right_cols],
    )
    return out
