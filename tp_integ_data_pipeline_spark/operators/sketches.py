"""Mergeable heavy-hitters (shard top-k with deterministic error
bounds) — the frequent-items member of the engine's re-aggregable
sketch family (HLL distinct rollup q120, fixed-bin histogram
quantiles q133). Metwally et al. 2005 Space-Saving semantics,
re-expressed as relational partials instead of a stateful summary.

Shape: each shard keeps its exact top-``c`` counts plus one scalar
cutoff (its c-th count — the maximum any UNKEPT key can have there).
Merging is pure aggregation over the kept rows; for every key,
``true count ∈ [lower, upper]`` where lower = Σ kept counts and
upper adds the cutoffs of shards that did NOT report the key. With
``c ≥`` per-shard distinct keys every cutoff is 0 and the merge is
EXACT — the oracle-able regime (the q120 coupon-exact pattern). The
partials are what you'd persist per day/shard and re-aggregate
without rescanning raw data.

No reference-repo counterpart (SURVEY.md §2.10 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def shard_topk_partials(
    df: DataFrame, key: str, shard: str, c: int
) -> tuple[DataFrame, DataFrame]:
    """Per-shard partial state: (kept, cutoffs).

    kept = (shard, key, cnt) — each shard's exact top-``c`` by
    (count desc, key) — and cutoffs = (shard, cutoff) with cutoff =
    the LARGEST count the shard TRUNCATED (the (c+1)-th count; 0 when
    the shard kept every key, i.e. the partial is complete — so a
    shard with EXACTLY ``c`` distinct keys still reports 0 and the
    exact-regime guarantee holds)."""
    counts = df.groupBy(shard, key).agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy(shard).orderBy(F.col("cnt").desc(), F.col(key))
    ranked = counts.withColumn("_rk", F.row_number().over(w))
    kept = ranked.filter(F.col("_rk") <= c).drop("_rk")
    cutoffs = (
        ranked.groupBy(shard)
        .agg(
            F.coalesce(
                F.max(F.when(F.col("_rk") == c + 1, F.col("cnt"))), F.lit(0)
            ).alias("cutoff")
        )
    )
    return kept, cutoffs


def merge_shard_topk(
    kept: DataFrame, cutoffs: DataFrame, key: str, shard: str, k: int
) -> DataFrame:
    """Merge shard partials into global top-``k`` with bounds:
    (key, lower, upper) ranked by lower. ``upper - lower`` =
    Σ cutoffs of non-reporting shards; total cutoff mass rides one
    audited 1-row scalar broadcast."""
    total = cutoffs.agg(F.sum("cutoff").alias("_total_cutoff"))
    per_key = (
        kept.join(cutoffs, shard)
        .groupBy(key)
        .agg(
            F.sum("cnt").alias("lower"),
            F.sum("cutoff").alias("_present_cutoff"),
        )
    )
    bounded = per_key.crossJoin(F.broadcast(total)).select(
        key,
        "lower",
        (F.col("lower") + F.col("_total_cutoff") - F.col("_present_cutoff")).alias(
            "upper"
        ),
    )
    # top-k via TakeOrderedAndProject (orderBy+limit — per-partition
    # top-k then a k-row driver merge, never a single-partition global
    # window over the s·c candidate rows); ranks are then numbered
    # over the ≤ k survivors only
    topk = bounded.orderBy(F.col("lower").desc(), F.col(key)).limit(k)
    wk = W.orderBy(F.col("lower").desc(), F.col(key))
    return topk.select(
        key, "lower", "upper", F.row_number().over(wk).cast("long").alias("rank")
    )


# ---------------------------------------------------------------------------
# Count-min sketch: the point-frequency member of the sketch family
# (HLL = distincts q120, histogram = quantiles q133, Space-Saving =
# heavy hitters q147; CMS answers "how often did THIS key occur" in
# depth × width counters regardless of corpus size).
# ---------------------------------------------------------------------------
def cms_bucket(col: F.Column, row: int, width: int) -> F.Column:
    """Row-``row`` CMS bucket for a key: chunk ``row`` of the key's
    engine-portable md5 digest (hex chars [8r+1, 8r+8] -> long -> mod
    width) — ONE digest yields all four row placements (32 hex chars /
    8), so the hot build path hashes each occurrence once instead of
    ``depth`` times, and DuckDB reproduces every counter placement
    exactly (xxhash64 has no DuckDB twin). Supports depth <= 4."""
    return _digest_bucket(F.md5(col), row, width)


def _digest_bucket(digest: F.Column, row: int, width: int) -> F.Column:
    return (
        F.conv(F.substring(digest, row * 8 + 1, 8), 16, 10).cast("long")
        % F.lit(width)
    )


def cms_build(
    keyed: DataFrame, key: str = "key", depth: int = 4, width: int = 256
) -> DataFrame:
    """Fold a key stream into a count-min sketch relation
    ``(row, bucket, c)`` of ≤ depth × width rows. ONE md5 per input
    row (the four placements are disjoint digest chunks — see
    cms_bucket), one explode into the ``depth`` placements, then one
    map-side-combined aggregate — the sketch is REAGGREGABLE partial
    state: shard/day sketches union and re-sum into the corpus sketch
    without rescanning raw data, the property the whole sketch family
    shares."""
    if depth > 4:
        raise ValueError("cms_build: depth > 4 exceeds the md5 chunk supply")
    digested = keyed.select(F.md5(F.col(key)).alias("__d"))
    placed = digested.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _digest_bucket(F.col("__d"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p")
    )
    return placed.groupBy("p.row", "p.bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key: str = "key", depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-frequency estimates for ``probes`` (a bounded key list):
    for each key, min over the depth rows of its counter — the classic
    CMS upper-bound estimate (never under-counts; over-counts only by
    hash-collision mass ≈ n/width per row, min-reduced across rows).
    The probe relation re-derives its buckets with the same portable
    hash and joins the ≤ depth × width sketch — broadcast-sized by
    construction."""
    if depth > 4:
        # mirror cms_build's guard: row 4+ would substring past the
        # 32-hex md5 digest, conv('') -> NULL buckets, and the left
        # join + coalesce(0) would silently min every estimate to 0
        raise ValueError("cms_estimate: depth > 4 exceeds the md5 chunk supply")
    placed = probes.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), cms_bucket(F.col(key), r, width).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key, "p.row", "p.bucket")
    return (
        placed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — the cardinality
# member of the family that, unlike HLL's register form (q120), keeps
# actual hash SAMPLES, so sketches also intersect (join-size
# estimation) and the whole state is k rows of plain doubles.
# ---------------------------------------------------------------------------
def kmv_hash01(col: F.Column) -> F.Column:
    """Engine-portable uniform hash into (0, 1]: first 12 md5 hex
    chars -> 48-bit integer / 2^48 (exact in a double; both engines
    compute the identical value, the q158 md5-draw rule). +1 before
    the divide keeps 0 out of the range so 1/h is always finite."""
    return (F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(1 << 48)
    )


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest DISTINCT hash values of ``col`` — a k-row sketch.
    orderBy+limit is TakeOrderedAndProject: each partition keeps its
    local k-min, the driver merges k-row heads — the same mergeable
    shape a shard union uses (union two sketches, re-take the k min).
    """
    return (
        df.select(kmv_hash01(F.col(col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: (k-1)/h_k with h_k
    the k-th smallest hash (Bar-Yossef et al. 2002). If the sketch
    holds fewer than k rows the column had < k distinct values and the
    sketch IS the exact distinct set — return that count. One row out:
    (n_kept, est)."""
    agg = sketch.agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("__hk"))
    return agg.select(
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise((F.lit(float(k - 1))) / F.col("__hk"))
        .alias("est"),
    )


# ---------------------------------------------------------------------------
# Bloom filter — the membership member of the sketch family, i.e. the
# semi-join PRUNING tool: build on the dim-side key set, broadcast the
# bit words as a plan literal (exactly how Spark's own runtime filters
# ship), drop fact rows row-locally BEFORE the shuffle/join.
# ---------------------------------------------------------------------------
_BLOOM_SEEDS = 3


def _bloom_pos(col: F.Column, seed: int, m_bits: int) -> F.Column:
    """Seeded engine-portable bit position: md5('{seed}:' || key) first
    8 hex -> long -> mod m_bits (the cms_bucket hash with a seed
    prefix, so DuckDB reproduces every bit placement)."""
    msg = F.concat(F.lit(f"{seed}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(msg), 1, 8), 16, 10).cast("long") % F.lit(m_bits)


def bloom_words(keys: DataFrame, col: str, m_bits: int = 65536) -> list[int]:
    """Build the filter: OR each key's _BLOOM_SEEDS bit positions into
    m_bits/64 words; returns the dense word list (driver-side, bounded
    by the CONSTANT m_bits — 1024 longs at the default — the same
    model-as-literal pattern as the IVF centroid attach, never a
    data-sized collect)."""
    placed = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col(col), s, m_bits) for s in range(_BLOOM_SEEDS)])
        ).alias("pos")
    )
    rows = (
        placed.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[int(r["w"])] = int(r["bits"])
    return words


def bloom_might_contain(colname: str, words: list[int], m_bits: int = 65536) -> F.Column:
    """Row-local membership test against the literal word array: true
    iff EVERY seeded bit is set (no false negatives; false-positive
    mass ~ (1 - e^(-k*n/m))^k). Pure codegen arithmetic (md5 / conv /
    div / shiftleft / bitwise-and in one SQL expression) — the filter
    runs inside the scan stage, before any exchange. ``colname`` is a
    column name or SQL expression string."""
    arr = "array(" + ", ".join(f"CAST({w} AS BIGINT)" for w in words) + ")"
    checks = []
    for s in range(_BLOOM_SEEDS):
        pos = (
            f"(CAST(conv(substring(md5(concat('{s}:', CAST({colname} AS STRING))), 1, 8),"
            f" 16, 10) AS BIGINT) % {m_bits})"
        )
        checks.append(
            f"((element_at({arr}, CAST({pos} div 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))) != 0)"
        )
    return F.expr(" AND ".join(checks))
