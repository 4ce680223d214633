"""Round-7 curation operators: corpus line-level dedup with document
reassembly (Falcon/CCNet granularity), a mergeable rank sketch, and
host-keyed per-domain caps. No reference-repo counterpart — SURVEY.md
§2.10 extension surface (round-6 VERDICT item 8 candidates a/b/c)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.dedup import (
    line_dedup_keep_first,
    segment_blocks,
)
from tp_integ_data_pipeline_spark.operators.rank_sketch import (
    rank_summaries,
    summary_quantiles,
)
from tp_integ_data_pipeline_spark.operators.selection import domain_cap, url_host
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table

_LINE_W = 6  # synthetic "line" width (fixture text carries no newlines)


# --------------------------------------------------------------------------
# q180 — corpus-wide line dedup (keep-first) + document reassembly
# --------------------------------------------------------------------------
@query(
    "q180_line_dedup_rebuild",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, (i - 1) // {_LINE_W} AS pos,
               array_to_string(w[i:i+{_LINE_W - 1}], ' ') AS line
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             UNNEST(range(1, greatest(len(w), 1) + 1, {_LINE_W})) AS t(i)
    ),
    kept AS (
        SELECT doc_id, pos, line FROM (
            SELECT doc_id, pos, line,
                   ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
            FROM b
        ) WHERE rn = 1
    ),
    reb AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(line, ' ' ORDER BY pos) AS txt
        FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM b GROUP BY doc_id)
    SELECT d.doc_id, t.n_lines,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           md5(COALESCE(r.txt, '')) AS rebuilt_md5
    FROM documents d JOIN tot t USING (doc_id) LEFT JOIN reb r USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def q180_line_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Falcon/CCNet-granularity exact dedup: segment every document
    into 6-word lines, keep only the corpus-FIRST occurrence of each
    distinct line (lexicographically smallest (doc_id, pos) — unique
    and deterministic), and reassemble the survivors in original
    order. The complement of q104's boilerplate strip (which drops
    EVERY copy of a frequent block): here exactly one copy of each
    line survives, so no unique content is lost. All relational —
    one segment explode, one struct-min groupBy on the line key, one
    line-keyed join back, one order-preserving re-concat (array_sort
    over (pos, line) structs; no data-sized window). The md5 of every
    rebuilt document must match the oracle's, proving both the winner
    choice and order-exact reassembly."""
    docs = load_table(spark, sf_dir, "documents")
    blocks = segment_blocks(docs, _LINE_W)
    kept = line_dedup_keep_first(blocks)
    reb = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("txt"),
    )
    tot = blocks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        tot.join(reb, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.md5(F.coalesce(F.col("txt"), F.lit(""))).alias("rebuilt_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q181 — mergeable rank sketch quantiles per event type
# --------------------------------------------------------------------------
# Rows-only by nature: the two-level MRL resampling is not SQL. The
# error-bound property suite (tests/test_rank_sketch.py) carries the
# hard checks: |est_rank - p·n| <= 2n/k vs the exact sort, exactness
# when k >= n, and partitioning-invariance of the bound.
@query("q181_rank_sketch_quantiles")
def q181_rank_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type quantile estimates {0.1, 0.25, 0.5, 0.75, 0.9}
    of the value column from a k=256 mergeable MRL summary — the
    shardable complement to q169's exact deciles: the ≤ k-row per-key
    summaries are what a daily pipeline persists and re-merges
    without rescanning raw data (the q120/q165/q168 re-aggregable
    contract). Deterministic compaction, so the estimates are
    run-stable."""
    ev = load_table(spark, sf_dir, "events")
    summ = rank_summaries(ev, "event_type", "value", "event_id", k=256)
    return summary_quantiles(summ, [0.1, 0.25, 0.5, 0.75, 0.9]).select(
        F.col("key").alias("event_type"),
        "p",
        F.round("est", 6).alias("est"),
    )


# --------------------------------------------------------------------------
# q182 — per-domain page caps over a URL column
# --------------------------------------------------------------------------
# Same deterministic URL on both engines; only the string-cast type
# name differs (Spark: STRING, DuckDB: VARCHAR).
_URL_EXPR = "'https://' || source || '-' || CAST(doc_id % 5 AS VARCHAR) || '.example.com/page/' || CAST(doc_id AS VARCHAR)"
_URL_EXPR_SPARK = _URL_EXPR.replace("AS VARCHAR", "AS STRING")


@query(
    "q182_domain_cap",
    oracle=f"""
    WITH u AS (
        SELECT doc_id, n_chars, {_URL_EXPR} AS url FROM documents
    ),
    h AS (
        SELECT doc_id, n_chars,
               lower(regexp_extract(url, '^[a-z][a-z0-9+.\\-]*://(?:[^/@]*@)?([^/:?#]+)', 1)) AS host
        FROM u
    ),
    ranked AS (
        SELECT host, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY host ORDER BY n_chars DESC, doc_id) AS rn
        FROM h
    ),
    kept AS (SELECT * FROM ranked WHERE rn <= 3)
    SELECT h.host,
           COUNT(*) AS n_docs,
           CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(k.n_chars), 0) AS BIGINT) AS kept_chars,
           CAST(COALESCE(SUM(k.doc_id), 0) AS BIGINT) AS kept_id_checksum
    FROM h LEFT JOIN kept k ON h.doc_id = k.doc_id
    GROUP BY h.host ORDER BY h.host
    """,
)
def q182_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/Gopher-style per-site page cap: derive each page's
    host from its URL (deterministic synthetic URL — the fixture has
    no URL column; host EXTRACTION is the real, RE2-portable
    machinery), keep at most 3 pages per host preferring longer
    documents (n_chars desc, doc_id tiebreak), and report per-host
    keep stats with the kept id-set checksummed so the oracle pins
    the exact selection. The cap is the salted two-phase top-N
    (operators/selection.domain_cap) — no windows, hot hosts spread
    over 16 tasks, each shuffle row bounded by the cap."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.expr(_URL_EXPR_SPARK).alias("url")
    )
    hosts = docs.withColumn("host", url_host("url")).drop("url")
    kept = domain_cap(
        hosts,
        "host",
        3,
        [(-F.col("n_chars")).alias("neg_chars"), F.col("doc_id").alias("tb")],
        "doc_id",
    )
    kept_stats = kept.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
        F.sum("doc_id").cast("long").alias("kept_id_checksum"),
    )
    totals = hosts.groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        totals.join(kept_stats, "host", "left")
        .select(
            "host",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).cast("long").alias("kept_chars"),
            F.coalesce("kept_id_checksum", F.lit(0)).cast("long").alias("kept_id_checksum"),
        )
        .orderBy("host")
    )
