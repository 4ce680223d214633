"""Round-9 operator family: filter-funnel provenance (q248–q254) —
per-document attribution of WHICH curation stage dropped it, rolled up
into the loss waterfalls / overlap / sensitivity reports a 100 TB
curation run publishes alongside the kept corpus.

The existing end-to-end pass (q97) reports only survivors; the
reference narrates per-step progress imperatively (reference
transf.py:29-34 prints row counts between steps, main.py:95-114 logs
the dedup delta) — this family is that narration re-expressed as ONE
lazy relational plan: every stage verdict becomes a column, the first
failing stage (in pipeline order) becomes the doc's provenance label,
and each report is a bounded keyed rollup over the same shared verdict
relation.

Stage order (the canonical curation sequence, each rule reused
verbatim from the operator that owns it):

1. ``bench_holdout``  — the doc IS the eval suite (q93's doc_id%97==0)
2. ``exact_dup``      — non-canonical text copy (q97's keep-first rule)
3. ``too_short``      — n_words < 10 (q94's length clause)
4. ``low_quality``    — outside q94's mean-word-length band / distinct
                        ratio (independent of length, so the two
                        verdicts separate in the overlap report)
5. ``contaminated``   — shares a word-8-gram with the benchmark (q93)
6. ``kept``

Scale shape, at 100 TB: ONE pass computes all verdicts — a text-keyed
shuffle for the canonical pick, a bounded benchmark-gram broadcast
semi-join for contamination (the gram set is benchmark-sized, fixed
forever), everything else row-local expressions — then every report is
a map-side-combinable rollup whose output is stages × groups bounded
(≤ 6 rows global, ≤ 6·|sources| per source, ≤ 16 masks, 4 stages,
5 thresholds). The verdict relation is computed once per (session,
corpus) and shared by all seven consumers (plans/session_cache.py,
the q87/q90/q175 discipline). The only partition-less window is the
waterfall's running remainder over the ≤ 6-row stage summary (stage
count is a code constant — GLOBAL_WINDOW_ALLOWED).

Oracle strategy: every verdict is deterministic relational logic over
exact integers/strings, so DuckDB replays the whole funnel from the
same shared CTE text — all seven queries are full hash checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.plans.curation import (
    MEAN_WORDLEN_HI,
    MEAN_WORDLEN_LO,
    MIN_DISTINCT_RATIO,
    MIN_WORDS,
    word_ngrams,
)
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table

_STAGES = [
    "bench_holdout",
    "exact_dup",
    "too_short",
    "low_quality",
    "contaminated",
    "kept",
]
_KEPT_IDX = 6  # stage_idx of survivors; 1..5 are drop stages
# threshold constants live in plans/curation.py, shared with the
# round-10 refresh family and the streaming refresh (parity contract)
_MIN_WORDS = MIN_WORDS
_THRESHOLDS = [5, 10, 20, 40, 80]

_STAGE_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in _STAGES) + "]"
_GRAMS_SQL = (
    "[array_to_string(w[i:i+7], ' ') for i in range(1, greatest(len(w) - 6, 1))]"
)

# Shared DuckDB CTE: the full per-doc verdict relation. Mirrors
# _funnel() column for column; every oracle below starts WITH this.
_FUNNEL_SQL = f"""
    fw AS (
        SELECT doc_id, source, lang, n_chars, text,
               string_split(text, ' ') AS w,
               (doc_id % 97 = 0) AS is_bench
        FROM documents
    ),
    fbench AS (
        SELECT DISTINCT unnest({_GRAMS_SQL}) AS gram
        FROM fw WHERE is_bench
    ),
    fhits AS (
        SELECT DISTINCT g.doc_id
        FROM (SELECT doc_id, unnest(list_distinct({_GRAMS_SQL})) AS gram
              FROM fw WHERE NOT is_bench) g
        JOIN fbench USING (gram)
    ),
    fverd AS (
        SELECT f.doc_id, f.source, f.lang, f.n_chars,
               CAST(len(f.w) AS INTEGER) AS n_words,
               FALSE AS is_bench,
               ROW_NUMBER() OVER (PARTITION BY f.text ORDER BY f.doc_id) > 1
                   AS is_dup,
               len(f.w) < {_MIN_WORDS} AS too_short,
               NOT ((list_sum(list_transform(f.w, x -> len(x))) * 1.0 / len(f.w))
                        BETWEEN {MEAN_WORDLEN_LO} AND {MEAN_WORDLEN_HI}
                    AND (len(list_distinct(f.w)) * 1.0 / len(f.w)) >= {MIN_DISTINCT_RATIO})
                   AS low_quality,
               (f.doc_id IN (SELECT doc_id FROM fhits)) AS contaminated
        FROM fw f WHERE NOT f.is_bench
    ),
    funnel AS (
        SELECT *,
               CASE WHEN is_dup THEN 2 WHEN too_short THEN 3
                    WHEN low_quality THEN 4 WHEN contaminated THEN 5
                    ELSE 6 END AS stage_idx
        FROM fverd
        UNION ALL
        SELECT doc_id, source, lang, n_chars,
               CAST(len(w) AS INTEGER) AS n_words,
               TRUE, FALSE, FALSE, FALSE, FALSE, 1
        FROM fw WHERE is_bench
    )
"""


def _stage_name(idx_col: F.Column) -> F.Column:
    return F.element_at(F.array(*[F.lit(s) for s in _STAGES]), idx_col)


# 1..6 as an exploded literal array (row-local — attaching it to the
# totals row densifies a report WITHOUT a join node, so no BNLJ).
# Lazy: building a Column requires an active SparkContext.
def _stage_idx_arr() -> F.Column:
    return F.array(*[F.lit(i) for i in range(1, _KEPT_IDX + 1)])

# DuckDB twin of the constant stage dimension.
_STAGE_DIM_SQL = (
    "SELECT CAST(unnest(generate_series(1, "
    f"{_KEPT_IDX})) AS INTEGER) AS stage_idx"
)


def funnel_verdicts(docs: DataFrame) -> DataFrame:
    """Per-doc verdict relation of the curation funnel: (doc_id,
    source, lang, n_chars, n_words, is_bench, is_dup, too_short,
    low_quality, contaminated, stage_idx) — one text-keyed shuffle
    (canonical pick), one bounded benchmark-gram broadcast semi-join
    (contamination), everything else row-local. ``docs`` must carry
    (doc_id, source, lang, n_chars, text); exposed standalone so the
    10× scale probe (bench.py) can drive it on a synthetic corpus."""
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        "text",
        F.split("text", " ").alias("w"),
        (F.col("doc_id") % 97 == 0).alias("is_bench"),
    )
    grams = F.array_distinct(word_ngrams(F.col("w"), 8))
    bench_grams = (
        base.filter("is_bench")
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    corpus = base.filter(~F.col("is_bench"))
    hits = (
        corpus.select("doc_id", F.explode(grams).alias("gram"))
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    n_words = F.size("w")
    sum_len = F.aggregate(
        F.transform("w", lambda x: F.length(x)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    mean_wl = sum_len * F.lit(1.0) / n_words
    distinct_ratio = F.size(F.array_distinct("w")) * F.lit(1.0) / n_words
    verd = (
        corpus.withColumn(
            "rn", F.row_number().over(W.partitionBy("text").orderBy("doc_id"))
        )
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            n_words.alias("n_words"),
            F.lit(False).alias("is_bench"),
            (F.col("rn") > 1).alias("is_dup"),
            (n_words < _MIN_WORDS).alias("too_short"),
            (
                ~(
                    mean_wl.between(MEAN_WORDLEN_LO, MEAN_WORDLEN_HI)
                    & (distinct_ratio >= MIN_DISTINCT_RATIO)
                )
            ).alias("low_quality"),
            F.col("__hit").isNotNull().alias("contaminated"),
        )
    )
    bench_rows = base.filter("is_bench").select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        n_words.alias("n_words"),
        F.lit(True).alias("is_bench"),
        F.lit(False).alias("is_dup"),
        F.lit(False).alias("too_short"),
        F.lit(False).alias("low_quality"),
        F.lit(False).alias("contaminated"),
    )
    stage_idx = (
        F.when(F.col("is_bench"), 1)
        .when(F.col("is_dup"), 2)
        .when(F.col("too_short"), 3)
        .when(F.col("low_quality"), 4)
        .when(F.col("contaminated"), 5)
        .otherwise(_KEPT_IDX)
    )
    return verd.unionByName(bench_rows).withColumn(
        "stage_idx", stage_idx.cast("int")
    )


def _funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached, lazily-checkpointed funnel_verdicts over the
    corpus — computed once per (session, corpus), consumed by all the
    funnel reports."""
    from tp_integ_data_pipeline_spark.plans.session_cache import session_cached

    def build() -> DataFrame:
        return funnel_verdicts(
            load_table(spark, sf_dir, "documents")
        ).localCheckpoint(eager=False)

    return session_cached(spark, "funnel_verdicts", (sf_dir,), build)


_FLAG_INT = [
    ("is_dup", "f_dup"),
    ("too_short", "f_short"),
    ("low_quality", "f_quality"),
    ("contaminated", "f_contam"),
]


# --------------------------------------------------------------------------
# q248 — global loss waterfall
# --------------------------------------------------------------------------
@query(
    "q248_filter_funnel",
    oracle=f"""
    WITH {_FUNNEL_SQL},
    s AS (
        SELECT stage_idx, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM funnel GROUP BY stage_idx
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_input FROM funnel),
    dim AS ({_STAGE_DIM_SQL})
    SELECT d.stage_idx, ({_STAGE_LIST_SQL})[d.stage_idx] AS stage,
           CAST(COALESCE(s.n_docs, 0) AS BIGINT) AS n_docs,
           CAST(COALESCE(s.n_chars, 0) AS BIGINT) AS n_chars,
           CAST(n_input
                - SUM(CASE WHEN d.stage_idx < {_KEPT_IDX}
                           THEN COALESCE(s.n_docs, 0) ELSE 0 END)
                    OVER (ORDER BY d.stage_idx) AS BIGINT) AS n_remaining,
           ROUND(COALESCE(s.n_docs, 0) * 1.0 / n_input, 6) AS pct_of_input
    FROM dim d LEFT JOIN s ON s.stage_idx = d.stage_idx CROSS JOIN tot
    ORDER BY d.stage_idx
    """,
)
def q248_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus loss waterfall: per pipeline stage, how many docs
    (and chars) that stage dropped, the corpus remaining after it, and
    the share of input lost — the per-step progress the reference
    narrates imperatively (transf.py:29-34), as one auditable relation.
    Output is STAGE-STABLE (r9 ADVICE): every stage appears even when
    it drops zero docs, so a monitor diffing runs sees rates move
    through 0 instead of rows appearing/disappearing — the 6-row
    constant stage dimension is exploded off the totals row (row-local,
    no join against data). Scale shape: one keyed rollup of the shared
    verdict relation to ≤ 6 rows; the running remainder is a window
    over that CODE-CONSTANT summary (GLOBAL_WINDOW_ALLOWED)."""
    fun = _funnel(spark, sf_dir)
    s = fun.groupBy("stage_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = fun.agg(F.count(F.lit(1)).cast("long").alias("n_input"))
    dim = tot.select(
        "n_input", F.explode(_stage_idx_arr()).alias("stage_idx")
    )
    n_docs = F.coalesce(F.col("n_docs"), F.lit(0)).cast("long")
    win = W.orderBy("stage_idx").rowsBetween(W.unboundedPreceding, 0)
    dropped = F.sum(
        F.when(F.col("stage_idx") < _KEPT_IDX, n_docs).otherwise(F.lit(0))
    ).over(win)
    return (
        dim.join(s, "stage_idx", "left")
        .select(
            "stage_idx",
            _stage_name(F.col("stage_idx")).alias("stage"),
            n_docs.alias("n_docs"),
            F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("n_chars"),
            (F.col("n_input") - dropped).cast("long").alias("n_remaining"),
            F.round(n_docs * F.lit(1.0) / F.col("n_input"), 6).alias(
                "pct_of_input"
            ),
        )
        .orderBy("stage_idx")
    )


# --------------------------------------------------------------------------
# q249 — per-doc drop attribution (the provenance table itself)
# --------------------------------------------------------------------------
@query(
    "q249_drop_attribution",
    oracle=f"""
    WITH {_FUNNEL_SQL}
    SELECT doc_id, source, stage_idx, ({_STAGE_LIST_SQL})[stage_idx] AS stage,
           CAST(is_dup AS INTEGER) AS f_dup,
           CAST(too_short AS INTEGER) AS f_short,
           CAST(low_quality AS INTEGER) AS f_quality,
           CAST(contaminated AS INTEGER) AS f_contam,
           CAST(is_dup AS INTEGER) + CAST(too_short AS INTEGER)
               + CAST(low_quality AS INTEGER) + CAST(contaminated AS INTEGER)
               AS n_fail
    FROM funnel
    WHERE stage_idx BETWEEN 2 AND 5
    ORDER BY doc_id
    """,
)
def q249_drop_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document provenance for every dropped corpus doc: the stage
    that killed it (first failure in pipeline order) plus ALL four
    independent verdict flags — the record that lets a curation audit
    answer "why is doc X not in the training set" without re-running
    anything. Pure row-local projection + filter of the shared verdict
    relation; output is the dropped subset only."""
    fun = _funnel(spark, sf_dir)
    flags = [F.col(src).cast("int").alias(dst) for src, dst in _FLAG_INT]
    n_fail = sum(F.col(src).cast("int") for src, _ in _FLAG_INT)
    return (
        fun.where(F.col("stage_idx").between(2, 5))
        .select(
            "doc_id",
            "source",
            "stage_idx",
            _stage_name(F.col("stage_idx")).alias("stage"),
            *flags,
            n_fail.alias("n_fail"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q250 — per-source loss waterfall
# --------------------------------------------------------------------------
@query(
    "q250_source_loss_waterfall",
    oracle=f"""
    WITH {_FUNNEL_SQL},
    s AS (
        SELECT source, stage_idx, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM funnel GROUP BY source, stage_idx
    ),
    tot AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source
        FROM funnel GROUP BY source
    ),
    dim AS (
        SELECT t.source, t.n_source, d.stage_idx
        FROM tot t CROSS JOIN ({_STAGE_DIM_SQL}) d
    )
    SELECT d.source, d.stage_idx, ({_STAGE_LIST_SQL})[d.stage_idx] AS stage,
           CAST(COALESCE(s.n_docs, 0) AS BIGINT) AS n_docs,
           CAST(COALESCE(s.n_chars, 0) AS BIGINT) AS n_chars,
           ROUND(COALESCE(s.n_docs, 0) * 1.0 / d.n_source, 6) AS pct_of_source,
           CAST(d.n_source
                - SUM(CASE WHEN d.stage_idx < {_KEPT_IDX}
                           THEN COALESCE(s.n_docs, 0) ELSE 0 END)
                      OVER (PARTITION BY d.source ORDER BY d.stage_idx)
                AS BIGINT) AS n_remaining
    FROM dim d
    LEFT JOIN s ON s.source = d.source AND s.stage_idx = d.stage_idx
    ORDER BY d.source, d.stage_idx
    """,
)
def q250_source_loss_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The waterfall sliced per source: which feeds lose most, at which
    stage, and what survives of each — the per-shard report a mixture
    rebalance (q102/q187) consumes, since a source bleeding 80% at
    dedup needs different treatment from one failing quality. Output is
    STAGE-STABLE per source (r9 ADVICE): exactly 6·|sources| rows, the
    stage dimension exploded row-locally off the per-source totals.
    The running remainder window is PARTITIONED BY source (a data key —
    no global window), and the per-source total joins back on the same
    bounded summary."""
    fun = _funnel(spark, sf_dir)
    s = fun.groupBy("source", "stage_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = fun.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_source")
    )
    dim = tot.select(
        "source", "n_source", F.explode(_stage_idx_arr()).alias("stage_idx")
    )
    n_docs = F.coalesce(F.col("n_docs"), F.lit(0)).cast("long")
    win = (
        W.partitionBy("source").orderBy("stage_idx").rowsBetween(
            W.unboundedPreceding, 0
        )
    )
    dropped = F.sum(
        F.when(F.col("stage_idx") < _KEPT_IDX, n_docs).otherwise(F.lit(0))
    ).over(win)
    return (
        dim.join(s, ["source", "stage_idx"], "left")
        .select(
            "source",
            "stage_idx",
            _stage_name(F.col("stage_idx")).alias("stage"),
            n_docs.alias("n_docs"),
            F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("n_chars"),
            F.round(n_docs * F.lit(1.0) / F.col("n_source"), 6).alias(
                "pct_of_source"
            ),
            (F.col("n_source") - dropped).cast("long").alias("n_remaining"),
        )
        .orderBy("source", "stage_idx")
    )


# --------------------------------------------------------------------------
# q251 — independent-verdict overlap (who fails what, jointly)
# --------------------------------------------------------------------------
@query(
    "q251_stage_overlap",
    oracle=f"""
    WITH {_FUNNEL_SQL}
    SELECT CAST(is_dup AS INTEGER) * 8 + CAST(too_short AS INTEGER) * 4
               + CAST(low_quality AS INTEGER) * 2 + CAST(contaminated AS INTEGER)
               AS fail_mask,
           CAST(is_dup AS INTEGER) AS f_dup,
           CAST(too_short AS INTEGER) AS f_short,
           CAST(low_quality AS INTEGER) AS f_quality,
           CAST(contaminated AS INTEGER) AS f_contam,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM funnel WHERE NOT is_bench
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY 1
    """,
)
def q251_stage_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint distribution of the four INDEPENDENT stage verdicts (the
    funnel's priority order hides co-failures — this unhides them):
    one row per failure bitmask with doc/char mass. Mask 0 is the clean
    corpus; multi-bit rows quantify how much the stages overlap, i.e.
    how much each stage's waterfall number depends on pipeline order.
    One keyed rollup to ≤ 16 rows."""
    fun = _funnel(spark, sf_dir)
    flags = [F.col(src).cast("int").alias(dst) for src, dst in _FLAG_INT]
    mask = (
        F.col("is_dup").cast("int") * 8
        + F.col("too_short").cast("int") * 4
        + F.col("low_quality").cast("int") * 2
        + F.col("contaminated").cast("int")
    )
    return (
        fun.where(~F.col("is_bench"))
        .groupBy(mask.alias("fail_mask"), *flags)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .orderBy("fail_mask")
    )


# --------------------------------------------------------------------------
# q252 — marginal vs gross attribution per stage
# --------------------------------------------------------------------------
@query(
    "q252_marginal_attribution",
    oracle=f"""
    WITH {_FUNNEL_SQL},
    nb AS (
        SELECT *,
               CAST(is_dup AS INTEGER) + CAST(too_short AS INTEGER)
                   + CAST(low_quality AS INTEGER) + CAST(contaminated AS INTEGER)
                   AS n_fail
        FROM funnel WHERE NOT is_bench
    ),
    long AS (
        SELECT 'exact_dup' AS stage, 2 AS ref, is_dup AS flagged,
               n_fail, stage_idx FROM nb
        UNION ALL SELECT 'too_short', 3, too_short, n_fail, stage_idx FROM nb
        UNION ALL SELECT 'low_quality', 4, low_quality, n_fail, stage_idx FROM nb
        UNION ALL SELECT 'contaminated', 5, contaminated, n_fail, stage_idx FROM nb
    )
    SELECT ref AS stage_idx, stage,
           CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(CASE WHEN flagged AND n_fail = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique,
           CAST(SUM(CASE WHEN stage_idx = ref THEN 1 ELSE 0 END) AS BIGINT)
               AS n_attributed,
           CAST(SUM(CASE WHEN flagged AND stage_idx < ref THEN 1 ELSE 0 END)
               AS BIGINT) AS n_shadowed
    FROM long GROUP BY ref, stage
    ORDER BY ref
    """,
)
def q252_marginal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per stage: gross kill count (every doc it flags), unique kills
    (docs ONLY it flags — its irreplaceable contribution), attributed
    kills (the waterfall's first-fail number), and shadowed kills
    (flagged here but already dropped upstream). n_flagged =
    n_attributed + n_shadowed by construction; a stage whose n_unique
    ≈ 0 is fully redundant and can be dropped from the pipeline — the
    order-sensitivity audit of the q248 waterfall. Stack-unpivot of the
    verdict columns (the q226 shape) ×4 rows, then a 4-row rollup."""
    fun = _funnel(spark, sf_dir)
    n_fail = sum(F.col(src).cast("int") for src, _ in _FLAG_INT)
    nb = fun.where(~F.col("is_bench")).select(
        "stage_idx",
        n_fail.alias("n_fail"),
        *[F.col(src) for src, _ in _FLAG_INT],
    )
    long = nb.selectExpr(
        "stack(4, 'exact_dup', 2, is_dup, 'too_short', 3, too_short, "
        "'low_quality', 4, low_quality, 'contaminated', 5, contaminated) "
        "AS (stage, ref, flagged)",
        "n_fail",
        "stage_idx",
    )
    return (
        long.groupBy("ref", "stage")
        .agg(
            F.sum(F.when(F.col("flagged"), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum(F.when(F.col("flagged") & (F.col("n_fail") == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
            F.sum(F.when(F.col("stage_idx") == F.col("ref"), 1).otherwise(0))
            .cast("long")
            .alias("n_attributed"),
            F.sum(
                F.when(F.col("flagged") & (F.col("stage_idx") < F.col("ref")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_shadowed"),
        )
        .select(
            F.col("ref").alias("stage_idx"),
            "stage",
            "n_flagged",
            "n_unique",
            "n_attributed",
            "n_shadowed",
        )
        .orderBy("stage_idx")
    )


# --------------------------------------------------------------------------
# q253 — length-threshold sensitivity sweep
# --------------------------------------------------------------------------
@query(
    "q253_threshold_sensitivity",
    oracle=f"""
    WITH {_FUNNEL_SQL},
    surv AS (SELECT * FROM funnel WHERE NOT is_bench AND NOT is_dup),
    t AS (SELECT unnest({_THRESHOLDS}) AS min_words)
    SELECT t.min_words,
           CAST(SUM(CASE WHEN s.n_words < t.min_words THEN 1 ELSE 0 END)
               AS BIGINT) AS n_too_short,
           CAST(SUM(CASE WHEN s.n_words >= t.min_words AND NOT s.low_quality
                          AND NOT s.contaminated THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN s.n_words >= t.min_words AND NOT s.low_quality
                           AND NOT s.contaminated THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 6) AS kept_rate
    FROM surv s CROSS JOIN t
    GROUP BY t.min_words
    ORDER BY t.min_words
    """,
)
def q253_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What-if sweep of the length gate: for each candidate min-word
    threshold, the docs it would cut and the final kept corpus with
    every OTHER verdict held fixed — the tuning curve consulted before
    moving a curation threshold on 100 TB (is the next notch cutting
    junk or corpus?). Row-local explode of the ≤ 5-value threshold
    list over the already-computed verdict columns (no re-scan of
    text), then a 5-row rollup; n_kept is monotonically nonincreasing
    in the threshold by construction."""
    fun = _funnel(spark, sf_dir)
    surv = fun.where(~F.col("is_bench") & ~F.col("is_dup"))
    kept = (
        (F.col("n_words") >= F.col("min_words"))
        & ~F.col("low_quality")
        & ~F.col("contaminated")
    )
    return (
        surv.select(
            "n_words",
            "low_quality",
            "contaminated",
            F.explode(F.array(*[F.lit(t) for t in _THRESHOLDS])).alias("min_words"),
        )
        .groupBy("min_words")
        .agg(
            F.sum((F.col("n_words") < F.col("min_words")).cast("int"))
            .cast("long")
            .alias("n_too_short"),
            F.sum(kept.cast("int")).cast("long").alias("n_kept"),
            F.round(F.sum(kept.cast("double")) / F.count(F.lit(1)), 6).alias(
                "kept_rate"
            ),
        )
        .orderBy("min_words")
    )


# --------------------------------------------------------------------------
# q254 — funnel drift between corpus halves (pipeline monitoring)
# --------------------------------------------------------------------------
@query(
    "q254_funnel_drift",
    oracle=f"""
    WITH {_FUNNEL_SQL},
    mid AS (SELECT MAX(doc_id) // 2 AS m FROM documents),
    s AS (
        SELECT stage_idx,
               CAST(SUM(CASE WHEN f.doc_id < mid.m THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_old,
               CAST(SUM(CASE WHEN f.doc_id >= mid.m THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new
        FROM funnel f, mid GROUP BY stage_idx
    ),
    tot AS (
        SELECT CAST(SUM(CASE WHEN f.doc_id < mid.m THEN 1 ELSE 0 END) AS BIGINT)
                   AS t_old,
               CAST(SUM(CASE WHEN f.doc_id >= mid.m THEN 1 ELSE 0 END) AS BIGINT)
                   AS t_new
        FROM funnel f, mid
    ),
    dim AS ({_STAGE_DIM_SQL})
    SELECT d.stage_idx, ({_STAGE_LIST_SQL})[d.stage_idx] AS stage,
           CAST(COALESCE(s.n_old, 0) AS BIGINT) AS n_old,
           CAST(COALESCE(s.n_new, 0) AS BIGINT) AS n_new,
           ROUND(COALESCE(COALESCE(s.n_old, 0) * 1.0 / NULLIF(t_old, 0), 0.0), 6)
               AS rate_old,
           ROUND(COALESCE(COALESCE(s.n_new, 0) * 1.0 / NULLIF(t_new, 0), 0.0), 6)
               AS rate_new,
           ROUND(COALESCE(COALESCE(s.n_new, 0) * 1.0 / NULLIF(t_new, 0), 0.0)
                 - COALESCE(COALESCE(s.n_old, 0) * 1.0 / NULLIF(t_old, 0), 0.0), 6)
               + 0 AS rate_delta
    FROM dim d LEFT JOIN s ON s.stage_idx = d.stage_idx CROSS JOIN tot
    ORDER BY d.stage_idx
    """,
)
def q254_funnel_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-drift monitor: per funnel stage, the drop RATE in the
    already-ingested corpus half (doc_id < mid, the q103 split
    convention) vs the newly-arrived half, and the delta — the
    regression alarm a standing 100 TB curation run watches (a new
    crawl whose low_quality rate doubles, or whose contamination rate
    jumps, is flagged here before it pollutes the kept set). Output is
    STAGE-STABLE (r9 ADVICE): all 6 stages always present, absent ones
    at rate 0.0 — a monitor diffing runs sees rates move through 0,
    never rows appear/disappear. One conditional-sum rollup of the
    shared verdict relation to ≤ 6 rows; the split point (max doc_id
    div 2, the q103 convention) is folded into the LAZY plan as a
    1-row broadcast scalar attach (BNLJ_ALLOWED — the q102/q187
    capacity pattern; no job runs at plan-construction time). The
    delta is negative-capable, so both engines normalize it ROUND+0.
    An EMPTY half (a shard whose ids all land one side of the split)
    pins that half's rates to 0.0 on both engines — NULLIF + coalesce,
    the ANSI divide-by-zero rule — instead of Spark throwing where
    DuckDB returns NULL."""
    fun = _funnel(spark, sf_dir)
    # fun partitions documents exactly (corpus ∪ bench rows), so its
    # max doc_id equals the table's — no second documents scan.
    mid = fun.agg(F.expr("max(doc_id) div 2").alias("m"))
    is_old = F.col("doc_id") < F.col("m")
    funm = fun.crossJoin(F.broadcast(mid))
    s = funm.groupBy("stage_idx").agg(
        F.sum(is_old.cast("int")).cast("long").alias("n_old"),
        F.sum((~is_old).cast("int")).cast("long").alias("n_new"),
    )
    # Half totals fold from the ≤6-row stage summary (stages partition
    # the corpus). The rollup subtree is referenced twice (tot + the
    # densify join) — left UNcheckpointed deliberately so the audit
    # sees the full plan; the duplicate pass is a ≤6-row rollup over
    # the already-checkpointed verdict relation.
    tot = s.agg(
        F.sum("n_old").cast("long").alias("t_old"),
        F.sum("n_new").cast("long").alias("t_new"),
    )
    dim = tot.select(
        "t_old", "t_new", F.explode(_stage_idx_arr()).alias("stage_idx")
    )
    n_old = F.coalesce(F.col("n_old"), F.lit(0)).cast("long")
    n_new = F.coalesce(F.col("n_new"), F.lit(0)).cast("long")
    rate_old = F.coalesce(
        n_old * F.lit(1.0) / F.nullif(F.col("t_old"), F.lit(0)),
        F.lit(0.0),
    )
    rate_new = F.coalesce(
        n_new * F.lit(1.0) / F.nullif(F.col("t_new"), F.lit(0)),
        F.lit(0.0),
    )
    return (
        dim.join(s, "stage_idx", "left")
        .select(
            "stage_idx",
            _stage_name(F.col("stage_idx")).alias("stage"),
            n_old.alias("n_old"),
            n_new.alias("n_new"),
            F.round(rate_old, 6).alias("rate_old"),
            F.round(rate_new, 6).alias("rate_new"),
            (F.round(rate_new - rate_old, 6) + F.lit(0.0)).alias("rate_delta"),
        )
        .orderBy("stage_idx")
    )
