"""Round-12 family: CHAINED refreshes (q267–q271) — refresh N+1
consuming refresh N's emitted output, the multi-day operating mode the
reference actually runs (main.py:80–114 re-executes the same pipeline
every period against whatever the previous runs left standing).
Rounds 10–11 proved ONE refresh correct (batch ≡ streaming ≡ DuckDB);
this family closes the induction step: the artifacts a refresh emits —
the grown kept corpus, the grown benchmark suite, and the ONE-integer
carry row (q259) — are sufficient to run the NEXT refresh without
re-scanning the previous one, proven as zero-tolerance hash checks
against a one-shot DuckDB CTE that replays BOTH refreshes.

The chain over the corpus: m = max(doc_id) div 2, m2 = 3*(max div 4).
Yesterday's corpus is the funnel-kept existing half (doc_id < m,
_exist_kept — reused verbatim). Refresh 1 admits the m..m2 slice
against it (suite = bench docs with doc_id < m2); its admitted docs
grow the corpus to K1 and its bench docs grow the suite. Refresh 2
admits the >= m2 slice against K1 under the full suite, and packs
CONTINUING FROM THE CARRY ROW refresh 1 emitted — not from a rescan.
The funnel body is admission_core (round10_queries), byte-shared with
the single-refresh family, so the chain cannot drift from the proven
refresh semantics.

What each hash check proves:
- q267: per-doc verdicts across both refreshes — an arrival-2 doc
  whose text was ADMITTED in refresh 1 is dup_vs_corpus; one whose
  text was REJECTED is not (rejects never entered the corpus); a
  bench doc delivered by refresh 1 contaminates refresh-2 arrivals.
- q268: the two-refresh packing layout, refresh 2 starting from
  c1.next_start_offset (the consumed carry row), equals ONE
  continuous cumsum over both admitted sets — sequences straddle the
  refresh boundary bit-identically.
- q269: refresh 2's carry row with every "before" field DERIVED FROM
  refresh 1's carry row (n_kept_before = c1.n_kept_before +
  c1.n_admitted; tokens_before = c1.next_start_offset) equals the
  from-scratch rescan — "tomorrow is runnable without re-scanning
  today" as arithmetic, not prose.

Scale shape at 100 TB: identical to one refresh, twice — each
admission is batch-sized windows + ONE text-keyed equi-join against
the standing corpus + a bounded suite broadcast; the chain adds NO
corpus-sized recomputation (that is the point: K1 is K0 plus the
batch-sized admitted slice, the carry is one row). The streaming
twin of this chain is exercised in tests/test_round12_ops.py through
streaming/refresh.py's chaining seams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.plans.curation import (
    bounded_bench_grams,
    word_ngrams,
)
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.plans.round9_queries import (
    _GRAMS_SQL,
    _MIN_WORDS,
)
from tp_integ_data_pipeline_spark.plans.round10_queries import (
    _ADMIT_IDX,
    _PACK_BUDGET,
    _QUALITY_OK_SQL,
    _R_FLAGS,
    _R_STAGE_LIST_SQL,
    _R_STAGES,
    _REFRESH_SQL,
    _carry_report,
    _carry_report_from_scalars,
    _exist_kept,
    _mixture_report,
    _retro_contam_report,
    admission_core,
    mixture_oracle_tail,
    retro_oracle_tail,
)
from tp_integ_data_pipeline_spark.sources.fixtures import load_table

# One-shot DuckDB replay of BOTH refreshes, appended to _REFRESH_SQL
# (which supplies rw/rmid/rbg_all/rkept). Mirrors _chain_adm1/_chain_
# adm2 column for column; the funnel expressions are the byte-same
# fragments the single-refresh CTE uses (_GRAMS_SQL, _QUALITY_OK_SQL,
# the keep-first window, the CASE stage ladder).
_CHAIN_SQL = f"""
    cm2 AS (SELECT 3 * (MAX(doc_id) // 4) AS m2 FROM documents),
    ca1 AS (
        SELECT rw.* FROM rw, rmid, cm2
        WHERE doc_id >= m AND doc_id < m2 AND NOT is_bench
    ),
    cbg1 AS (
        SELECT DISTINCT unnest({_GRAMS_SQL}) AS gram
        FROM rw, cm2 WHERE is_bench AND doc_id < m2
    ),
    ca1_hits AS (
        SELECT DISTINCT g.doc_id
        FROM (SELECT doc_id, unnest(list_distinct({_GRAMS_SQL})) AS gram
              FROM ca1) g
        JOIN cbg1 USING (gram)
    ),
    cv1 AS (
        SELECT doc_id, source, text,
               CAST(len(w) AS INTEGER) AS n_words,
               FALSE AS is_bench,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) > 1
                   AS dup_batch,
               text IN (SELECT text FROM rkept) AS dup_corpus,
               len(w) < {_MIN_WORDS} AS too_short,
               NOT {_QUALITY_OK_SQL.format(w="w")} AS low_quality,
               (doc_id IN (SELECT doc_id FROM ca1_hits)) AS contaminated
        FROM ca1
    ),
    cadm1 AS (
        SELECT doc_id, source, text, n_words, is_bench, dup_batch,
               dup_corpus, too_short, low_quality, contaminated,
               CASE WHEN dup_batch THEN 2 WHEN dup_corpus THEN 3
                    WHEN too_short THEN 4 WHEN low_quality THEN 5
                    WHEN contaminated THEN 6 ELSE {_ADMIT_IDX} END AS stage_idx
        FROM cv1
        UNION ALL
        SELECT doc_id, source, text, CAST(len(w) AS INTEGER), TRUE,
               FALSE, FALSE, FALSE, FALSE, FALSE, 1
        FROM rw, rmid, cm2 WHERE doc_id >= m AND doc_id < m2 AND is_bench
    ),
    ck1 AS (
        SELECT doc_id, source, text, n_words FROM rkept
        UNION ALL
        SELECT doc_id, source, text, n_words FROM cadm1
        WHERE stage_idx = {_ADMIT_IDX}
    ),
    ca2 AS (SELECT rw.* FROM rw, cm2 WHERE doc_id >= m2 AND NOT is_bench),
    ca2_hits AS (
        SELECT DISTINCT g.doc_id
        FROM (SELECT doc_id, unnest(list_distinct({_GRAMS_SQL})) AS gram
              FROM ca2) g
        JOIN rbg_all USING (gram)
    ),
    cv2 AS (
        SELECT doc_id, source, text,
               CAST(len(w) AS INTEGER) AS n_words,
               FALSE AS is_bench,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) > 1
                   AS dup_batch,
               text IN (SELECT text FROM ck1) AS dup_corpus,
               len(w) < {_MIN_WORDS} AS too_short,
               NOT {_QUALITY_OK_SQL.format(w="w")} AS low_quality,
               (doc_id IN (SELECT doc_id FROM ca2_hits)) AS contaminated
        FROM ca2
    ),
    cadm2 AS (
        SELECT doc_id, source, n_words, is_bench, dup_batch, dup_corpus,
               too_short, low_quality, contaminated,
               CASE WHEN dup_batch THEN 2 WHEN dup_corpus THEN 3
                    WHEN too_short THEN 4 WHEN low_quality THEN 5
                    WHEN contaminated THEN 6 ELSE {_ADMIT_IDX} END AS stage_idx
        FROM cv2
        UNION ALL
        SELECT doc_id, source, CAST(len(w) AS INTEGER), TRUE,
               FALSE, FALSE, FALSE, FALSE, FALSE, 1
        FROM rw, cm2 WHERE doc_id >= m2 AND is_bench
    ),
    cchain AS (
        SELECT 1 AS refresh_id, doc_id, source, n_words, is_bench,
               dup_batch, dup_corpus, too_short, low_quality, contaminated,
               stage_idx
        FROM cadm1
        UNION ALL
        SELECT 2, doc_id, source, n_words, is_bench, dup_batch, dup_corpus,
               too_short, low_quality, contaminated, stage_idx
        FROM cadm2
    )
"""


def _chain_bounds(docs: DataFrame) -> DataFrame:
    """1-row (m, m2): the existing/arrival-1/arrival-2 boundaries —
    m = max div 2 (the standing q103/q254 split), m2 = 3*(max div 4)
    (the arriving half cut in two). Broadcast scalar, no driver pull."""
    return docs.agg(
        F.expr("max(doc_id) div 2").alias("m"),
        F.expr("3 * (max(doc_id) div 4)").alias("m2"),
    )


def _chain_adm1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached refresh-1 admission: the m..m2 arrival against
    the standing kept corpus, suite = bench docs visible through m2
    (yesterday's suite + the bench docs THIS refresh delivers — the
    q255 convention applied to the first chain link)."""
    from tp_integ_data_pipeline_spark.plans.session_cache import session_cached

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "n_chars", "text"
        )
        based = docs.crossJoin(F.broadcast(_chain_bounds(docs)))
        arr1 = based.filter(
            (F.col("doc_id") >= F.col("m")) & (F.col("doc_id") < F.col("m2"))
        ).drop("m", "m2")
        suite1 = bounded_bench_grams(
            based.filter(
                (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < F.col("m2"))
            ).select(F.split("text", " ").alias("w")),
            F.array_distinct(word_ngrams(F.col("w"), 8)),
        )
        return admission_core(
            arr1, _exist_kept(spark, sf_dir), suite1
        ).localCheckpoint(eager=False)

    return session_cached(spark, "chain_adm1", (sf_dir,), build)


def _chain_kept1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached GROWN corpus after refresh 1: K1 = standing kept
    ∪ refresh-1 admitted (texts recovered by id-keyed join, the
    existing_kept recipe). Texts stay unique by construction (K0 is
    keep-first-unique; admitted texts are batch-unique and not in K0 —
    dup flags filtered them), so downstream probes never fan out.
    Shape: (doc_id, source, n_words, text) — the standing-corpus
    contract every refresh consumer expects."""
    from tp_integ_data_pipeline_spark.plans.session_cache import session_cached

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        k0 = _exist_kept(spark, sf_dir).select(
            "doc_id", "source", "n_words", "text"
        )
        adm1_kept = (
            _chain_adm1(spark, sf_dir)
            .filter(F.col("stage_idx") == _ADMIT_IDX)
            .select("doc_id", "source", "n_words")
            .join(docs, "doc_id")
        )
        return k0.unionByName(
            adm1_kept.select("doc_id", "source", "n_words", "text")
        ).localCheckpoint(eager=False)

    return session_cached(spark, "chain_kept1", (sf_dir,), build)


def _chain_adm2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached refresh-2 admission: the >= m2 arrival against
    the GROWN corpus K1 (_chain_kept1), suite = all bench docs. The
    byte-same admission_core as every other refresh."""
    from tp_integ_data_pipeline_spark.plans.session_cache import session_cached

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "n_chars", "text"
        )
        based = docs.crossJoin(F.broadcast(_chain_bounds(docs)))
        arr2 = based.filter(F.col("doc_id") >= F.col("m2")).drop("m", "m2")
        suite2 = bounded_bench_grams(
            docs.filter(F.col("doc_id") % 97 == 0).select(
                F.split("text", " ").alias("w")
            ),
            F.array_distinct(word_ngrams(F.col("w"), 8)),
        )
        return admission_core(
            arr2, _chain_kept1(spark, sf_dir), suite2
        ).localCheckpoint(eager=False)

    return session_cached(spark, "chain_adm2", (sf_dir,), build)


# --------------------------------------------------------------------------
# q267 — per-doc verdicts across the two-refresh chain
# --------------------------------------------------------------------------
@query(
    "q267_chain_admission",
    oracle=f"""
    WITH {_REFRESH_SQL},
    {_CHAIN_SQL}
    SELECT CAST(refresh_id AS INTEGER) AS refresh_id, doc_id, source,
           stage_idx, ({_R_STAGE_LIST_SQL})[stage_idx] AS stage,
           CAST(dup_batch AS INTEGER) AS f_dup_batch,
           CAST(dup_corpus AS INTEGER) AS f_dup_corpus,
           CAST(too_short AS INTEGER) AS f_short,
           CAST(low_quality AS INTEGER) AS f_quality,
           CAST(contaminated AS INTEGER) AS f_contam,
           CAST(stage_idx = {_ADMIT_IDX} AS INTEGER) AS admitted
    FROM cchain
    ORDER BY doc_id
    """,
)
def q267_chain_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q255's per-document provenance across BOTH chained refreshes,
    tagged by which refresh judged each doc. The hash check is the
    chain-semantics proof per row: refresh-1 ADMITTED texts block
    refresh-2 arrivals as dup_vs_corpus, refresh-1 REJECTED texts do
    not (rejects never entered the corpus), and refresh-1's delivered
    bench docs contaminate refresh-2 arrivals (the suite grew).
    Projection of the two shared admission relations; arrival ids are
    disjoint and increasing, so doc_id order is chain order."""
    flags = [F.col(src).cast("int").alias(dst) for src, dst in _R_FLAGS]

    def proj(adm: DataFrame, rid: int) -> DataFrame:
        return adm.select(
            F.lit(rid).cast("int").alias("refresh_id"),
            "doc_id",
            "source",
            "stage_idx",
            F.element_at(
                F.array(*[F.lit(s) for s in _R_STAGES]), F.col("stage_idx")
            ).alias("stage"),
            *flags,
            (F.col("stage_idx") == _ADMIT_IDX).cast("int").alias("admitted"),
        )

    return (
        proj(_chain_adm1(spark, sf_dir), 1)
        .unionByName(proj(_chain_adm2(spark, sf_dir), 2))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q268 — two-refresh packing, refresh 2 consuming the emitted carry row
# --------------------------------------------------------------------------
@query(
    "q268_chain_packing",
    oracle=f"""
    WITH {_REFRESH_SQL},
    {_CHAIN_SQL},
    cadm_all AS (
        SELECT refresh_id, doc_id, n_words FROM cchain
        WHERE stage_idx = {_ADMIT_IDX}
    ),
    coff0 AS (
        SELECT CAST(COALESCE(SUM(n_words), 0) AS BIGINT) AS o FROM rkept
    ),
    cc AS (
        SELECT refresh_id, doc_id, n_words,
               CAST(COALESCE(SUM(n_words) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cb
        FROM cadm_all
    )
    SELECT CAST(refresh_id AS INTEGER) AS refresh_id, doc_id,
           CAST(n_words AS BIGINT) AS n_tokens,
           CAST((o + cb) // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST((o + cb) % {_PACK_BUDGET} AS BIGINT) AS seq_offset
    FROM cc, coff0
    ORDER BY doc_id
    """,
)
def q268_chain_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both refreshes' packing layouts, where refresh 2 continues from
    the CARRY ROW refresh 1 emitted (c1.next_start_offset folded in as
    a 1-row broadcast — never a rescan of refresh 1's admitted docs,
    and never a driver pull at plan-construction time; BNLJ_ALLOWED).
    The oracle packs the union of both admitted sets in ONE continuous
    window — equality means the chained layout is bit-identical to
    repacking everything, sequences straddling the refresh boundary
    included (q257's continuation property across runs, not just
    batches). Same global_cumsum eager-scalar caveat as q257
    (packing.py:62, GLOBAL_WINDOW_ALLOWED on the ≤n_buckets offset
    table)."""
    from tp_integ_data_pipeline_spark.operators.packing import global_cumsum

    adm1 = _chain_adm1(spark, sf_dir)
    adm2 = _chain_adm2(spark, sf_dir)
    c1 = _carry_report(_exist_kept(spark, sf_dir), adm1)

    def pack(adm: DataFrame, off: DataFrame, rid: int) -> DataFrame:
        cum = global_cumsum(
            adm.filter(F.col("stage_idx") == _ADMIT_IDX).select(
                "doc_id", "n_words"
            ),
            "doc_id",
            "n_words",
        )
        return cum.crossJoin(F.broadcast(off)).select(
            F.lit(rid).cast("int").alias("refresh_id"),
            "doc_id",
            F.col("n_words").cast("long").alias("n_tokens"),
            F.expr(f"(o + cum_before) div {_PACK_BUDGET}").alias("seq_id"),
            ((F.col("o") + F.col("cum_before")) % F.lit(_PACK_BUDGET))
            .cast("long")
            .alias("seq_offset"),
        )

    off0 = _exist_kept(spark, sf_dir).agg(
        F.coalesce(F.sum("n_words"), F.lit(0)).cast("long").alias("o")
    )
    # the chain link: refresh 2's start offset IS the emitted carry row
    off1 = c1.select(F.col("next_start_offset").cast("long").alias("o"))
    return (
        pack(adm1, off0, 1).unionByName(pack(adm2, off1, 2)).orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q269 — refresh 2's carry row derived FROM refresh 1's carry row
# --------------------------------------------------------------------------
@query(
    "q269_chain_carry_state",
    oracle=f"""
    WITH {_REFRESH_SQL},
    {_CHAIN_SQL},
    k2 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_kept_before,
               CAST(COALESCE(SUM(n_words), 0) AS BIGINT) AS tokens_before
        FROM ck1
    ),
    a2 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
               CAST(SUM(CASE WHEN stage_idx = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bench_held,
               CAST(SUM(CASE WHEN stage_idx BETWEEN 2 AND 6 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_rejected,
               CAST(SUM(CASE WHEN stage_idx = {_ADMIT_IDX} THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_admitted,
               CAST(COALESCE(SUM(CASE WHEN stage_idx = {_ADMIT_IDX}
                                      THEN n_words ELSE 0 END), 0) AS BIGINT)
                   AS tokens_admitted
        FROM cadm2
    )
    SELECT n_kept_before, n_batch, n_bench_held, n_rejected, n_admitted,
           tokens_before, tokens_admitted,
           CAST(tokens_before + tokens_admitted AS BIGINT) AS next_start_offset,
           CAST((tokens_before + tokens_admitted) // {_PACK_BUDGET} AS BIGINT)
               AS n_seqs_complete,
           CAST((tokens_before + tokens_admitted) % {_PACK_BUDGET} AS BIGINT)
               AS boundary_fill
    FROM k2, a2
    """,
)
def q269_chain_carry_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chain's induction step as ONE hash-checked row: refresh 2's
    carry state where every "before" field is DERIVED from refresh 1's
    emitted carry row — n_kept_before = c1.n_kept_before +
    c1.n_admitted, tokens_before = c1.next_start_offset — while the
    oracle recomputes both by scanning the grown corpus K1 from
    scratch. Equality proves the q259 row is a SUFFICIENT handoff:
    tomorrow's bookkeeping needs yesterday's one row, not yesterday's
    corpus. All-integer; two 1-row rollups + the carry-row projection
    (scalar attaches, BNLJ_ALLOWED)."""
    c1 = _carry_report(
        _exist_kept(spark, sf_dir), _chain_adm1(spark, sf_dir)
    )
    k2 = c1.select(
        (F.col("n_kept_before") + F.col("n_admitted"))
        .cast("long")
        .alias("n_kept_before"),
        F.col("next_start_offset").cast("long").alias("tokens_before"),
    )
    return _carry_report_from_scalars(k2, _chain_adm2(spark, sf_dir))


# --------------------------------------------------------------------------
# q270 — post-chain mixture rebalance (refresh 2's operational report)
# --------------------------------------------------------------------------
@query(
    "q270_chain_mixture",
    oracle=f"""
    WITH {_REFRESH_SQL},
    {_CHAIN_SQL},
    {mixture_oracle_tail("ck1", f"cadm2 WHERE stage_idx = {_ADMIT_IDX}")}
    """,
)
def q270_chain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rebalance report refresh 2 emits — q256's exact arithmetic
    (shared _mixture_report / mixture_oracle_tail, one definition for
    the single refresh, the streamed sink, and the chain) over the
    CHAINED state: before = the grown corpus K1 refresh 1 left
    standing, added = refresh 2's admitted docs. Completes the chain
    family's downstream pairing the way q265 completed round 11's:
    the reports a standing pipeline consumes after refresh 2 are
    computed from chain-carried state and hash-match a from-scratch
    two-refresh replay. Two bounded per-source rollups full-joined +
    ONE 1-row totals attach (BNLJ_ALLOWED)."""
    return _mixture_report(
        _chain_kept1(spark, sf_dir),
        _chain_adm2(spark, sf_dir)
        .filter(F.col("stage_idx") == _ADMIT_IDX)
        .select("source"),
    )


# --------------------------------------------------------------------------
# q271 — post-chain retroactive contamination (suite growth in refresh 2)
# --------------------------------------------------------------------------
@query(
    "q271_chain_retro_contam",
    oracle=f"""
    WITH {_REFRESH_SQL},
    {_CHAIN_SQL},
    {retro_oracle_tail("ck1", "rw, cm2 WHERE is_bench AND doc_id >= m2")}
    """,
)
def q271_chain_retro_contam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q260's retroactive decontamination audit at the chain's second
    link: refresh 2's bench docs (doc_id >= m2) sweep the corpus K1
    that was standing when refresh 2 began. This is where the chain
    makes the audit REAL in a way one refresh cannot: K1 contains
    refresh-1 admissions that were decontaminated only against the
    SMALLER suite visible through m2, so refresh-2's bench grams can
    legitimately hit them — exactly the growing-suite exposure a
    standing corpus accrues between refreshes (and the exactness
    argument from q260 still holds per link: every K1 doc had zero
    grams in the suite it was admitted under, so any hit here comes
    from the new slice alone). Shared _retro_contam_report /
    retro_oracle_tail; one gram explode over K1 + the bounded
    new-slice broadcast semi-join + a per-source rollup."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.agg(F.expr("3 * (max(doc_id) div 4)").alias("m2"))
    new_bench = (
        docs.crossJoin(F.broadcast(mid))
        .filter(
            (F.col("doc_id") >= F.col("m2")) & (F.col("doc_id") % 97 == 0)
        )
        .select(F.split("text", " ").alias("w"))
    )
    return _retro_contam_report(_chain_kept1(spark, sf_dir), new_bench)
