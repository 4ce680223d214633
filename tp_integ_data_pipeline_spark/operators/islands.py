"""Distributed gaps-and-islands detection over an integer id column.

The textbook solution — ``LEAD(id) OVER (ORDER BY id)`` — plans as a
single global sort: one reducer owns every row, which is exactly the
shape that dies at 100 TB. This module computes every consecutive
(id, next_id) pair WITHOUT a global sort, by value-bucketing:

- level 0: LEAD partitioned by ``id div B`` finds every successor
  that lives in the same bucket (all but one pair per bucket);
- each bucket's LAST id gets its successor from the bucket-summary
  relation (bucket -> min/max id), where "next non-empty bucket" is
  the SAME consecutive-pair problem over bucket indices — so the
  summary recurses, shrinking the relation by ~B per level;
- the final level (n / B^levels rows — sub-row-count at any realistic
  scale for B=512, levels=3: 10^11 ids -> < 1 row) uses a plain
  partitionless LEAD over that provably tiny relation.

No reference-repo counterpart (the reference is a single-node pandas
ETL, reference main.py:46-454); the operator exists for the scale
design point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

DEFAULT_BUCKET_WIDTH = 512
DEFAULT_LEVELS = 3


def consecutive_pairs(
    ids: DataFrame,
    id_col: str = "id",
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    levels: int = DEFAULT_LEVELS,
) -> DataFrame:
    """(id, nxt) for every consecutive pair of the DISTINCT ids in
    ``ids`` — the maximum id (no successor) emits no row. ``levels``
    bounds the recursion; the top level sorts n / bucket_width^levels
    rows on one partition (choose levels so that is small: the
    default 512^3 ≈ 1.3e8 shrink factor covers any realistic id
    space)."""
    if levels <= 0:
        w = W.orderBy(id_col)  # documented-tiny relation (see module doc)
        return (
            ids.select(id_col, F.lead(id_col).over(w).alias("nxt"))
            .where(F.col("nxt").isNotNull())
        )
    b = ids.select(
        F.col(id_col),
        F.expr(f"CAST({id_col} DIV {bucket_width} AS BIGINT)").alias("__b"),
    )
    w = W.partitionBy("__b").orderBy(id_col)
    within = (
        b.select(F.col(id_col), F.lead(id_col).over(w).alias("nxt"))
        .where(F.col("nxt").isNotNull())
    )
    summary = b.groupBy("__b").agg(
        F.min(id_col).alias("__mn"), F.max(id_col).alias("__mx")
    )
    summary = summary.localCheckpoint(eager=False)  # feeds recursion + 2 joins
    bpairs = consecutive_pairs(
        summary.select(F.col("__b").alias("__bid")), "__bid", bucket_width, levels - 1
    ).select(F.col("__bid").alias("__cur_b"), F.col("nxt").alias("__nxt_b"))
    cross = (
        bpairs.join(summary.select(F.col("__b").alias("__cur_b"), "__mx"), "__cur_b")
        .join(summary.select(F.col("__b").alias("__nxt_b"), "__mn"), "__nxt_b")
        .select(F.col("__mx").alias(id_col), F.col("__mn").alias("nxt"))
    )
    return within.unionByName(cross)


def id_gaps(
    ids: DataFrame,
    id_col: str = "id",
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    levels: int = DEFAULT_LEVELS,
) -> DataFrame:
    """Missing ranges of the distinct-id sequence as (gap_start,
    gap_end, gap_len) rows — one row per maximal absent run strictly
    inside [min(id), max(id)]."""
    pairs = consecutive_pairs(ids, id_col, bucket_width, levels)
    return pairs.where(F.col("nxt") - F.col(id_col) > 1).select(
        (F.col(id_col) + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col(id_col) - 1).alias("gap_len"),
    )
