"""Cross-document sequence packing (training-batch assembly).

Chunking (q95) windows WITHIN a document; packing assembles documents
ACROSS the corpus into fixed token-budget training sequences — the
"concatenate and split" step every LLM pre-training pipeline runs after
curation. A document's sequence is `floor(tokens_before_it / budget)`
in a deterministic global order, so the layout is reproducible across
runs and cluster sizes.

Scale shape: the naive formulation is a global running sum — a window
with no partition key, which drags the whole corpus through ONE task.
`global_cumsum` instead computes a distributed prefix sum:

1. bucket every row by a DETERMINISTIC pure function of `order_col`
   (value-range stride from one min/max scalar) — NOT
   `repartitionByRange`, whose sampled boundaries can differ between
   two evaluations of the same subtree (each exchange samples with its
   own RDD-id-derived seed), silently misaligning the local sums and
   the offset table whenever exchange reuse doesn't unify them;
2. per-bucket running sums — a window PARTITIONED by the bucket, all
   buckets in parallel;
3. per-bucket totals (≤ n_buckets rows) get their own tiny cumsum and
   broadcast-join back as offsets.

Total cost: one tiny min/max aggregate + one hash shuffle on the
bucket + one bounded broadcast — vs the naive plan's single-reducer
sort. The trade vs sampled range partitioning: bucket balance tracks
the key distribution (fine for dense ids; a pathologically skewed key
space concentrates buckets — pick a different order key or pre-rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    n_buckets: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = sum of ``value_col`` over all rows strictly
    BEFORE this row in ascending ``order_col`` order (exclusive prefix
    sum). ``order_col`` must be numeric, unique, and non-null
    (duplicate keys would make the within-tie order, and so the prefix
    sums, run-dependent; a NULL key has no position in a total order —
    rejected explicitly, because the bucket equi-join would otherwise
    drop the row silently). Distributed: see module docstring; the
    only unpartitioned window runs over ≤ n_buckets offset rows.

    Cost note: the upstream plan is evaluated up to three times (the
    min/max scalar, the window branch, the totals branch) — same order
    as the previous sampled-range shape, which also sampled the child
    and planned two exchanges. Callers stacking an expensive pipeline
    under this should checkpoint/persist it first."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # One bounded driver scalar (min/max + null count) fixes the bucket
    # boundaries deterministically — every evaluation of the plan
    # agrees on every row's bucket, unlike sampled range boundaries.
    lo, hi, n_null = df.agg(
        F.min(order_col),
        F.max(order_col),
        F.count(F.when(F.col(order_col).isNull(), 1)),
    ).first()
    if n_null:
        raise ValueError(
            f"global_cumsum: {n_null} NULL value(s) in order column "
            f"{order_col!r} — a null key has no position in the order"
        )
    if lo is None:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    span = int(hi) - int(lo) + 1
    stride = max(1, -(-span // n_buckets))  # ceil div
    # Integer `div`, not `/` (doubles lose exactness past 2^53), and
    # div-BEFORE-subtract: `order - lo` itself can overflow int64 for
    # full-range key spans; `order div stride` is bounded by
    # ±2^63/stride, and the subtracted constant uses the same
    # truncate-toward-zero semantics as SQL div, so buckets stay
    # monotone in the key (uneven widths around zero are fine — only
    # contiguity and order matter).
    lo_div = -((-int(lo)) // stride) if int(lo) < 0 else int(lo) // stride
    bucket = F.expr(
        f"(cast(`{order_col}` as bigint) div {stride}) - ({lo_div})"
    )
    rows = df.withColumn("__bkt", bucket)
    w_local = (
        W.partitionBy("__bkt").orderBy(order_col).rowsBetween(W.unboundedPreceding, -1)
    )
    local = rows.withColumn(
        "__local_before", F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
    )
    totals = rows.groupBy("__bkt").agg(F.sum(value_col).alias("__btot"))
    # partitionBy(lit(0)): same single-partition execution the bounded
    # ≤ n_buckets relation needs, but stated explicitly — no
    # "No Partition Defined for Window" warning implying an unbounded
    # single-reducer sort.
    w_off = (
        W.partitionBy(F.lit(0)).orderBy("__bkt").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__btot").over(w_off), F.lit(0))
    ).select("__bkt", "__offset")
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, (F.col("__offset") + F.col("__local_before")).cast("long"))
        .drop("__bkt", "__local_before", "__offset")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    start_offset: int = 0,
) -> DataFrame:
    """Assign each document to a training sequence of ``budget`` tokens:
    ``seq_id = tokens_before / budget`` in ascending ``id_col`` order
    (doc-granular packing — a document belongs to the sequence its
    first token lands in; a document longer than the budget overflows
    its sequence rather than splitting, chunk first via q95 semantics
    if that matters). Deterministic, one bucket shuffle.

    Returns (doc-level): id, n_tokens, seq_id, seq_offset (the doc's
    first-token position within its sequence).

    ``start_offset`` is the INCREMENTAL contract: the global token
    count already packed (yesterday's corpus) — today's batch
    continues mid-sequence from there, so packing a corpus in N
    batches with carried offsets yields bit-identical layout to
    packing it whole (asserted by the continuation property test).
    The carried state is ONE integer, not a re-scan of packed data.
    """
    cum = global_cumsum(docs, id_col, token_count_col)
    if start_offset:
        cum = cum.withColumn(
            "cum_before", F.col("cum_before") + F.lit(int(start_offset))
        )
    # Integer `div`, not `/`: long / long is double division in Spark,
    # which loses exactness once cumulative token counts pass 2^53 —
    # the same reason global_cumsum's bucket math uses div.
    return cum.select(
        F.col(id_col),
        F.col(token_count_col),
        F.expr(f"cum_before div {int(budget)}").alias("seq_id"),
        (F.col("cum_before") % F.lit(budget)).cast("long").alias("seq_offset"),
    )


def pack_token_runs(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    start_offset: int = 0,
    start_slot: int = 0,
) -> DataFrame:
    """Token-level sequence materialization — what the trainer actually
    consumes: (seq_id, slot, id, token_start, token_len), one row per
    (document, sequence) run, with documents STRADDLING a sequence
    boundary split across sequences (unlike :func:`pack_sequences`'
    doc-granular view, where a straddler just overflows). Every
    sequence's runs sum to exactly ``budget`` tokens except the final
    one; concatenating a document's runs in seq order re-covers its
    tokens exactly once.

    A document occupying global token interval [c, c+n) (c from the
    distributed prefix sum) contributes one run to every sequence
    window [s·budget, (s+1)·budget) it overlaps: an expression-level
    ``sequence()`` explode of ≤ ceil(n/budget)+1 rows per doc — no
    extra shuffle beyond global_cumsum's. ``slot`` (the run's position
    within its sequence) is a row_number over a window partitioned by
    seq_id — bounded by ``budget`` rows per partition, since every doc
    contributes ≥ 1 token to its sequence. All arithmetic is integer
    ``div`` (never ``/``): exact past 2^53 cumulative tokens.

    Zero-token documents (nothing to emit) are excluded; the sequence
    ids they'd ambiguously sit between are unaffected.

    ``start_offset``/``start_slot``: the incremental contract — two
    integers of carried state (global tokens packed so far, and how
    many runs the previous batches placed into the partially-filled
    boundary sequence). With both carried, batch-wise packing is
    bit-identical to whole-corpus packing, slots included; the state
    for the next batch is this batch's total tokens + its run count in
    its own last sequence. Token geometry needs only ``start_offset``;
    ``start_slot`` exists purely because slot counts runs, and run
    count (unlike token count) is not derivable from the offset."""
    cum = global_cumsum(docs, id_col, token_count_col)
    if start_offset:
        cum = cum.withColumn(
            "cum_before", F.col("cum_before") + F.lit(int(start_offset))
        )
    b = int(budget)
    runs = (
        cum.filter(F.col(token_count_col) > 0)
        .select(
            F.col(id_col),
            F.col(token_count_col).cast("long").alias("__n"),
            F.col("cum_before"),
            F.explode(
                F.sequence(
                    F.expr(f"cum_before div {b}"),
                    F.expr(f"(cum_before + {token_count_col} - 1) div {b}"),
                )
            ).alias("seq_id"),
        )
    )
    start_g = F.greatest(F.col("seq_id") * b, F.col("cum_before"))
    end_g = F.least((F.col("seq_id") + 1) * b, F.col("cum_before") + F.col("__n"))
    placed = runs.select(
        "seq_id",
        F.col(id_col),
        (start_g - F.col("cum_before")).cast("long").alias("token_start"),
        (end_g - start_g).cast("long").alias("token_len"),
    )
    w_seq = W.partitionBy("seq_id").orderBy(id_col)
    boundary_seq = int(start_offset) // b
    slot = (F.row_number().over(w_seq) - 1).cast("long") + F.when(
        F.col("seq_id") == boundary_seq, F.lit(int(start_slot))
    ).otherwise(F.lit(0)).cast("long")
    return placed.withColumn("slot", slot).select(
        "seq_id", "slot", id_col, "token_start", "token_len"
    )


def sequence_stats(
    packed: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
) -> DataFrame:
    """Per-sequence packing audit: document count, token count, fill
    ratio against the budget, and whether the last document straddles
    into the next sequence (overflow > 0). A fill ratio far below 1
    means wasted batch capacity; frequent straddle means the chunker
    upstream should split long documents first. ``id_col`` /
    ``token_count_col`` must match the names given to
    :func:`pack_sequences`."""
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_col).cast("long").alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
            F.max(F.col("seq_offset") + F.col(token_count_col)).cast("long").alias("end_offset"),
        )
        .select(
            "seq_id",
            "n_docs",
            "n_tokens",
            "first_doc",
            "last_doc",
            F.round(F.col("n_tokens") / F.lit(budget), 4).alias("fill_ratio"),
            F.greatest(F.col("end_offset") - F.lit(budget), F.lit(0).cast("long")).alias(
                "overflow_tokens"
            ),
        )
    )
