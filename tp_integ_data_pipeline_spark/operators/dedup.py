"""Deduplication operators (SURVEY.md §2.10 X1/X2 + north-star mandate).

Generalizes the reference's dedup-before-write policies (anti-join on
`time` / `id`, /root/reference/main.py:101-133) into the operator set a
100 TB training-data pipeline needs:

- exact dedup            — hash groupBy / window canonical pick
- n-gram Jaccard         — token-shingle inverted index self-join
- MinHash + LSH          — 64 perms, 32 bands × 2 rows, built-in
                           xxhash64 only (no Python in the hot path)
- SimHash                — 64-bit, bit-count hamming, banded candidates
- embedding cosine       — see operators/similarity.py

Scale notes (1000 executors, 100 TB):
- All pair generation goes through an inverted index (shingle or LSH
  band bucket) — never a cross join. The shuffle key is the
  shingle/bucket, so skewed hot shingles are the main risk; callers
  can cap bucket width (`max_bucket`) to drop degenerate buckets
  (stop-shingle effect), the standard trade in web-scale dedup.
- Signatures are fixed-width (NUM_PERM×8 bytes) per doc — 100 TB of text at
  ~4 KB/doc is 25 G docs → 25 TB of signatures, fine to shuffle.
- Everything is built-in expression work (xxhash64, aggregate, min) —
  whole-stage codegen applies; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Exact dedup (X1)
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, subset: list[str], order_col: str) -> DataFrame:
    """Keep one deterministic canonical row per `subset` group (the one
    with the smallest `order_col`) — `dropDuplicates` with a stable
    winner, which plain dropDuplicates does not guarantee."""
    w = W.partitionBy(*subset).orderBy(order_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def dup_stats(df: DataFrame, subset: list[str]) -> DataFrame:
    """One-row summary of duplication over `subset`."""
    return df.groupBy(*subset).agg(F.count(F.lit(1)).alias("__c")).agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("__c").alias("n_rows"),
        (F.sum("__c") - F.count(F.lit(1))).alias("n_duplicates"),
        F.max("__c").alias("max_group"),
    )


# --------------------------------------------------------------------------
# Token shingles + n-gram Jaccard (X2 exact path)
# --------------------------------------------------------------------------


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct word-`k`-gram shingles per document: (id, sh).

    Pure expression work: split → sequence → slice/concat_ws →
    array_distinct → explode. Documents shorter than k tokens produce
    no shingles. Dedup is ROW-LOCAL (array_distinct before the
    explode): a relational `.distinct()` here would shuffle every
    shingle OCCURRENCE across the cluster just to drop within-doc
    repeats; the row-local form dedups inside the scan stage for free,
    so downstream consumers pay only their own algorithmic shuffle
    (groupBy id for signatures, shuffle on sh for the inverted index).
    """
    # Materialize the token array as a column first — referencing
    # split() inside the position lambda would recompute it per
    # position (O(len²) per doc).
    toked = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("__toks")
    )
    grams = F.when(
        F.size(F.col("__toks")) >= k,
        F.expr(
            f"transform(sequence(0, size(__toks) - {k}), "
            f"i -> concat_ws(' ', slice(__toks, i + 1, {k})))"
        ),
    ).otherwise(F.array())
    return toked.select("id", F.explode(F.array_distinct(grams)).alias("sh"))


def shingle_sql(table: str, id_col: str, text_col: str, k: int = 3) -> str:
    """DuckDB CTE text producing the identical (id, sh) relation."""
    return f"""
    sh AS (
        SELECT DISTINCT {id_col} AS id,
               array_to_string(toks[i:i+{k - 1}], ' ') AS sh
        FROM (SELECT {id_col}, string_split({text_col}, ' ') AS toks FROM {table}),
             UNNEST(range(1, greatest(len(toks) - {k - 2}, 1))) AS u(i)
    )"""


def pair_jaccard(
    sh: DataFrame, pairs: DataFrame | None = None, sizes: DataFrame | None = None
) -> DataFrame:
    """Jaccard similarity for document pairs from a shingle relation.

    With `pairs=None`, candidates are every pair sharing ≥1 shingle
    (inverted-index self-join — the exact n-gram path). With a
    candidate `pairs(a, b)` DataFrame (e.g. from LSH), only those are
    scored. `sizes(id, n)` can be supplied when the caller already
    computed per-doc shingle counts (avoids an extra aggregation over
    `sh`). Returns (a, b, inter, uni, jaccard).
    """
    if sizes is None:
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    if pairs is None:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sa = sh.alias("sa")
        sb = sh.alias("sb")
        inter = (
            pairs.join(sa, pairs.a == F.col("sa.id"))
            .join(sb, (pairs.b == F.col("sb.id")) & (F.col("sa.sh") == F.col("sb.sh")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    na = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("uni"),
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# MinHash + LSH (X2 scale path)
# --------------------------------------------------------------------------

NUM_PERM = 64
BANDS = 32  # rows-per-band r = NUM_PERM // BANDS = 2
# P(pair with Jaccard j becomes a candidate) = 1 - (1 - j^r)^b:
#   j=0.6 → 1 - 6e-7 ;  j=0.7 → 1 - 4e-10  (effectively exact above 0.6;
#   the 0.6-threshold property test passes at all three SFs).
# 64/32 was 128/64 in round 1: halving the sketch at the same r keeps
# candidate precision identical and costs ~6e-7 recall per true pair,
# while halving BOTH the signature aggregation work and — measured the
# bigger win at bench scale — the whole-stage-codegen compile time of
# the unrolled per-permutation min aggregates (q42 cold 14.5→9.8 s,
# warm 9.3→4.5 s at sf0.1; identical 256-pair output).


def minhash_signatures(sh: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """(id, sig array<long>) MinHash signatures from a shingle relation.

    Universal-hash permutations: perm_i(x) = (a_i·h(x) + b_i) mod p
    over ONE xxhash64 base hash masked to 31 bits (p = 2³¹−1, a_i/b_i
    fixed pseudo-random odd constants) — one string hash per shingle
    instead of num_perm, with products < 2⁶² so ANSI-mode arithmetic
    never overflows. NOTE: the simpler h1 + i·h2 double-hash scheme is
    NOT usable here — for large i the argmin collapses onto argmin(h2),
    destroying permutation independence (observed as LSH misses).
    One shuffle (groupBy id) produces all mins map-side-combined.
    """
    import random

    p = (1 << 31) - 1
    rng = random.Random(42)
    coeffs = [(rng.randrange(1, p) | 1, rng.randrange(0, p)) for _ in range(num_perm)]
    mask = F.lit((1 << 31) - 1)
    h = F.xxhash64(F.col("sh")).bitwiseAND(mask)
    hashed = sh.select("id", h.alias("h"))
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(p)).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    per_doc = hashed.groupBy("id").agg(*mins)
    return per_doc.select("id", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("sig"))


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = BANDS, num_perm: int = NUM_PERM, max_bucket: int = 1000
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH band bucket.

    Buckets wider than `max_bucket` are dropped (degenerate shingle
    content; quadratic pair blow-up at scale — same remedy as stop-word
    removal).
    """
    r = num_perm // bands
    band_hashes = F.array(
        *[
            F.xxhash64(F.lit(j), *[F.col("sig")[j * r + i] for i in range(r)])
            for j in range(bands)
        ]
    )
    buckets = sig.select(
        "id", F.posexplode(band_hashes).alias("band", "bucket")
    )
    wide = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("w"))
    buckets = buckets.join(
        wide.filter(F.col("w") <= max_bucket).select("band", "bucket"), ["band", "bucket"]
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .distinct()
    )


def estimate_filter_candidates(
    cand: DataFrame, sig: DataFrame, min_matches: int, num_perm: int = NUM_PERM
) -> DataFrame:
    """Drop candidate pairs whose signature-estimated Jaccard
    (matching-minhash fraction) falls below ``min_matches/num_perm``.

    The r=2 band scheme that makes ≥0.6-recall effectively exact is
    also extremely permissive downward (a j=0.2 pair is a candidate
    with p≈0.93), so the candidate set is dominated by junk — measured
    at sf0.1: 7,374 of 7,630 candidates estimate below 0.25 while every
    true pair estimates ≥0.75 (measured with the round-1 128-perm
    sketch; the junk/true separation is perm-count-invariant).
    Estimating from the two NUM_PERM-long
    signature arrays (`zip_with` + `aggregate`, whole-stage-codegen'd,
    one row per pair) is ~30× cheaper than the exact shingle-relation
    probe (hundreds of rows per doc, two joins), so pre-filtering here
    shrinks the expensive verification join to the true-pair set.
    """
    sa = sig.select(F.col("id").alias("a"), F.col("sig").alias("__sig_a"))
    sb = sig.select(F.col("id").alias("b"), F.col("sig").alias("__sig_b"))
    matches = F.expr(
        "aggregate(zip_with(__sig_a, __sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
    )
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .filter(matches >= F.lit(min_matches))
        .select("a", "b")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.6,
    est_sigmas: float | None = 4.5,
) -> DataFrame:
    """Near-duplicate pairs at `jaccard >= threshold`: LSH candidate
    generation + signature-estimate pre-filter + exact Jaccard
    verification of the survivors.

    For threshold ≥ 0.6 the band scheme's miss probability is < 1e-12,
    so the verified output equals the exact n-gram Jaccard result while
    scaling linearly in corpus size instead of quadratically.

    ``est_sigmas`` sets the pre-filter cutoff at
    threshold − est_sigmas·σ where σ = sqrt(t(1−t)/num_perm) — each
    permutation's match is an independent Bernoulli(j), so by
    Hoeffding a TRUE ≥threshold pair is wrongly pruned with
    p ≤ exp(−2·(est_sigmas·σ)²·num_perm) ≈ 6e-5 at t=0.6 (the σ
    definition makes the bound perm-count-invariant)
    (borderline pairs; higher-j pairs are exponentially safer).
    ``None`` disables the pre-filter for exact-recall-certain runs.
    """
    # One aggregation produces signatures AND shingle-set sizes (the
    # sizes ride along into the LSH band join), so the expensive
    # shingle scan feeds exactly: signature agg + the two verification
    # probes. No persist: caching here leaked across calls (each call
    # pinned a new copy, degrading later queries via GC pressure), and
    # Spark's ReuseExchange already dedupes the identical distinct
    # subtree within the single job.
    sh = shingles(df, id_col, text_col, k)
    mask = F.lit((1 << 31) - 1)
    hashed = sh.select("id", F.xxhash64(F.col("sh")).bitwiseAND(mask).alias("h"))
    import random

    p = (1 << 31) - 1
    rng = random.Random(42)
    coeffs = [(rng.randrange(1, p) | 1, rng.randrange(0, p)) for _ in range(NUM_PERM)]
    agg = hashed.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(p)).alias(f"m{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    sig = agg.select("id", F.array(*[F.col(f"m{i}") for i in range(NUM_PERM)]).alias("sig"), "n")
    cand = lsh_candidate_pairs(sig)
    if est_sigmas is not None:
        sigma = (threshold * (1 - threshold) / NUM_PERM) ** 0.5
        cutoff = max(0.0, threshold - est_sigmas * sigma)
        cand = estimate_filter_candidates(
            cand, sig, min_matches=int(cutoff * NUM_PERM), num_perm=NUM_PERM
        )
    sizes = sig.select("id", "n")
    scored = pair_jaccard(sh, cand, sizes=sizes)
    return scored.filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# SimHash (64-bit) — hamming-distance near-dup candidates
# --------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long): 64-bit SimHash over token occurrences.

    bit_i(doc) = sign of Σ_tokens (±1 by bit i of xxhash64(token)),
    occurrence-weighted. All expression-level: one explode + one
    groupBy with 64 conditional sums.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select("id", sig.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs with hamming(simhashA, simhashB) <= max_hamming (≤3 here).

    Candidates: pairs agreeing on ≥1 of four 16-bit chunks — by
    pigeonhole, any pair within hamming 3 must agree on one chunk, so
    candidate generation is exact for max_hamming ≤ 3 and stays an
    equi-join (no cross join).
    """
    sig = simhash_signatures(df, id_col, text_col)
    chunks = sig.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * j).bitwiseAND(F.lit(0xFFFF))
                    for j in range(4)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# --------------------------------------------------------------------------
# Duplicate-cluster resolution (X2 follow-through): near-dup PAIRS →
# connected components → one cluster id per document.
# --------------------------------------------------------------------------


def dup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected edge list ``pairs(a, b)``
    → ``(id, cluster)`` where ``cluster`` is the minimum node id
    reachable from ``id`` (the canonical-representative convention used
    to collapse near-duplicate groups to one kept document).

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converges in
    O(graph diameter) rounds. Near-dup graphs are overwhelmingly tiny
    cliques/chains (diameter ≤ ~4), so this beats the O(log n)
    large-star/small-star alternating algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) in
    practice — fewer shuffles per round and no edge rewriting. Each
    round is one shuffle on node id; labels are persisted and the
    lineage truncated per round so plans stay flat at scale. The
    convergence probe is an aggregate count, not a collect.

    Only nodes appearing in ``pairs`` are returned — callers union in
    singletons (cluster = own id) if they need total coverage.
    """
    edges = pairs.select("a", "b")
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("cluster", F.col("id"))
    ).persist()
    try:
        for _ in range(max_iter):
            neighbor = sym.join(labels, sym.b == labels.id).select(
                F.col("a").alias("id"), F.col("cluster")
            )
            new_labels = (
                labels.union(neighbor)
                .groupBy("id")
                .agg(F.min("cluster").alias("cluster"))
                .persist()
            )
            changed = (
                new_labels.join(
                    labels.withColumnRenamed("cluster", "__old"), "id"
                )
                .filter(F.col("cluster") != F.col("__old"))
                .count()
            )
            labels.unpersist()
            # Truncate lineage: without this each round's plan embeds
            # every prior round's join (exponential plan growth).
            labels = new_labels.localCheckpoint(eager=True)
            new_labels.unpersist()
            if changed == 0:
                break
        else:
            # Exhausting the round budget silently would split any
            # component with diameter > max_iter into several clusters.
            raise RuntimeError(
                f"dup_clusters did not converge within max_iter={max_iter} "
                f"rounds ({changed} labels still changing). The component "
                "diameter exceeds the budget — raise max_iter, or use "
                "alternating large-star/small-star (O(log n) rounds) for "
                "long-chain graphs."
            )
        return labels
    finally:
        sym.unpersist()


def cluster_sizes(clusters: DataFrame) -> DataFrame:
    """(cluster, n_docs) summary of a dup_clusters result."""
    return clusters.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_docs"))
