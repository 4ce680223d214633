"""Similarity search over embedding columns (SURVEY.md §2.10 X3).

Embeddings are first-class `array<float>` columns. Two paths:

- brute-force top-k cosine — exact; the baseline and the oracle-checked
  path. Cost O(|Q|·|N|·d) expression work; at 100 TB scale this is the
  per-query-batch fallback, with the query side broadcast.
- signed-random-projection LSH (`ann_topk_srp`) — approximate scale
  path: vectors sharing ≥1 hyperplane-sign band become candidates, then
  exact cosine re-rank among candidates only.

All dot products / norms are built-in higher-order functions
(`zip_with` + `aggregate`), i.e. JVM expression work on the array
values — no Python, no explode of the vector dimension.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.9
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — brute force O(n²)
    pair enumeration; the exact baseline for embedding near-dup."""
    a = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos6"))
    )


def knn_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (bounded query batches); neighbors
    ranked by (cosine desc, id) for determinism. Self-matches excluded.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    n = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        n.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("cos", 6).alias("cos6"))
    )


def srp_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Signed-random-projection bit signature (n_planes bits) as long.

    Hyperplanes are a fixed pseudo-random matrix generated driver-side
    from `seed` and baked into the plan as literals — deterministic
    across runs and cluster sizes.
    """
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def ann_topk_srp(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate top-k: SRP-LSH bucket candidates + exact re-rank.

    Signature split into `bands` chunks; vectors sharing any chunk with
    the query are candidates. Recall is tunable via n_planes/bands;
    this is the 100 TB path (candidate set ≪ corpus).
    """
    r = n_planes // bands
    mask = (1 << r) - 1
    with_sig = lambda df, idn, vecn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(vecn),
        srp_signature(F.col(vec_col), dim, n_planes).alias(f"{idn}_sig"),
    )
    q = with_sig(queries, "q_id", "qv")
    n = with_sig(emb, "n_id", "nv")
    q_bands = q.select(
        "q_id",
        "qv",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("q_id_sig"), j * r).bitwiseAND(F.lit(mask))
                    for j in range(bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    n_bands = n.select(
        "n_id",
        "nv",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("n_id_sig"), j * r).bitwiseAND(F.lit(mask))
                    for j in range(bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    cand = (
        q_bands.join(n_bands, ["band", "chunk"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "qv", "n_id", "nv")
        .distinct()
    )
    scored = cand.withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("cos", 6).alias("cos6"))
    )
