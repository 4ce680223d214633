"""Time-series AS-OF join: for every left row, the single latest right
row with ``right_ts <= left_ts`` per key (pandas ``merge_asof`` /
QuestDB ``ASOF JOIN`` semantics, direction='backward', inclusive).

The scale shape is NOT a range join (worst-case quadratic per key) and
NOT a per-left lateral scan: both sides UNION into one relation tagged
by side, sorted once per key on (ts, side, seq), and the right-side
payload is carried forward with a running ``last(ignorenulls)`` — one
shuffle, one sort, output-sized, the classic distributed as-of trick.
Right rows sort BEFORE left rows at equal timestamps, so a tie is
matched (inclusive <=); duplicate right timestamps resolve to the
highest ``right_seq`` (a required deterministic tie-break, same
contract as change_feed.compact_cdc).

No reference-repo counterpart — SURVEY.md §2.10 extension surface
(feature stores and event-context joins live on this operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_seq: str,
    right_vals: list[str],
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``right_vals`` from its
    latest prior-or-equal right row (null when none, or when the match
    is older than ``tolerance`` time units)."""
    left_payload = [c for c in left.columns]
    l_side = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).cast("double").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("double").alias("__seq"),
        F.struct(*[F.col(c) for c in left_payload]).alias("__l"),
        F.lit(None).cast(
            "struct<"
            + ",".join(
                f"`{c}`:{dict(right.dtypes)[c]}" for c in right_vals
            )
            + ",__rts:double>"
        ).alias("__r"),
    )
    r_side = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).cast("double").alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_seq).cast("double").alias("__seq"),
        F.lit(None).cast(l_side.schema["__l"].dataType.simpleString()).alias("__l"),
        F.struct(
            *[F.col(c) for c in right_vals],
            F.col(right_ts).cast("double").alias("__rts"),
        ).alias("__r"),
    )
    # right rows first at equal ts (side 0 < 1) -> inclusive <= ;
    # among equal right ts the highest seq wins (last in order)
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__side", F.col("__seq").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = l_side.unionByName(r_side).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1)
    if tolerance is not None:
        in_tol = (F.col("__ts") - F.col("__match.__rts")) <= F.lit(float(tolerance))
        out = out.withColumn(
            "__match",
            F.when(F.col("__match").isNotNull() & in_tol, F.col("__match")),
        )
    return out.select(
        *[F.col(f"__l.`{c}`").alias(c) for c in left_payload],
        *[F.col(f"__match.`{c}`").alias(c) for c in right_vals],
    )
