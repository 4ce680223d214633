"""Fuzzy record linkage: edit-distance join without a cross join.

The data-integration verb behind the reference's master-data merges
(transf.py's MERGE assumes exact keys; real feeds arrive with typos).
Candidate generation is the symmetric-delete neighborhood (SymSpell):
for edit distance <= 1, two strings match only if the sets
``{s} ∪ del1(s)`` intersect — equality (both originals), one
insertion/deletion (one original equals the other's deletion), or one
substitution (both sides delete the same position). So an EQUI-join
on exploded variants is recall-COMPLETE for ed<=1; false candidates
(e.g. transpositions) are removed by the exact ``levenshtein``
verify. The same construction with 2-delete neighborhoods extends to
ed<=2 at O(len^2) variants per row.

Scale shape: variants are row-local (len+1 strings per row, bounded
by the key length), the join is a plain string equi-join (shuffle on
variant — skew-safe for typical key distributions), verification is
JVM ``levenshtein`` on candidate pairs only. Never an all-pairs
compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _neighborhood(col: str) -> F.Column:
    """{s} ∪ del1(s) as an array column — the string itself plus every
    single-character deletion (SQL-expr form: substr accepts column
    positions there, unlike F.substring)."""
    return F.expr(
        f"array_union(array({col}), "
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))))"
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_id: str,
    right_id: str,
    max_dist: int = 1,
) -> DataFrame:
    """All (left_id, right_id, dist) pairs with
    ``levenshtein(left_key, right_key) <= max_dist`` (only
    ``max_dist=1`` is supported — the 1-delete neighborhood's
    completeness guarantee; larger radii need k-delete variants).
    Returns distinct pairs with the exact distance."""
    if max_dist != 1:
        raise ValueError("edit_distance_join supports max_dist=1")
    # Real catalogs REUSE key strings heavily (the part table's
    # adjective x noun vocabulary repeats each name many times), so
    # run the expensive middle — neighborhood explode, variant join,
    # levenshtein verify — over DISTINCT keys only, then fan the
    # matched KEY pairs back out to id pairs with two plain equi-
    # joins. Shrinks the explode and the verify set by the reuse
    # factor; identical output (candidate pairs were distinct-ed on
    # (id, key) pairs before, (key, key) now — same verified set).
    lids = left.select(F.col(left_id).alias("_lid"), F.col(left_key).alias("_lkey")).distinct()
    rids = right.select(F.col(right_id).alias("_rid"), F.col(right_key).alias("_rkey")).distinct()
    lv = (
        lids.select("_lkey")
        .distinct()
        .select("_lkey", F.explode(_neighborhood("_lkey")).alias("_variant"))
    )
    rv = (
        rids.select("_rkey")
        .distinct()
        .select("_rkey", F.explode(_neighborhood("_rkey")).alias("_variant"))
    )
    keypairs = (
        lv.join(rv, "_variant")
        .select("_lkey", "_rkey")
        .distinct()
        .withColumn("dist", F.levenshtein("_lkey", "_rkey").cast("long"))
        .filter(F.col("dist") <= max_dist)
    )
    return (
        keypairs.join(lids, "_lkey")
        .join(rids, "_rkey")
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            "dist",
        )
    )
