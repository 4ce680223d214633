"""Round-6 operator surface: BM25 ranked retrieval, count-min sketch
point frequencies, k-anonymity/l-diversity release audit, and
per-source n-gram novelty attribution. All SURVEY.md §2.10 extension
operators (no reference-repo counterpart; file:line citations live on
the operator docstrings they delegate to)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.privacy import k_anonymity_report
from tp_integ_data_pipeline_spark.operators.search import bm25_topk
from tp_integ_data_pipeline_spark.operators.sketches import cms_build, cms_estimate
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table

# --------------------------------------------------------------------------
# q164 — BM25 ranked retrieval over the document corpus
# --------------------------------------------------------------------------
_BM25_TERMS = ["join", "filter", "window"]
_BM25_K1, _BM25_B = 1.2, 0.75


@query(
    "q164_bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    tfs AS (
        SELECT token, id, COUNT(*) AS tf FROM toks
        WHERE token IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}', '{_BM25_TERMS[2]}')
          AND token <> ''
        GROUP BY 1, 2
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tfs GROUP BY 1),
    dls AS (
        SELECT doc_id AS id,
               len(list_filter(string_split(text, ' '), t -> t <> '')) AS dl
        FROM documents
    ),
    n_avg AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dls)
    SELECT id, ROUND(SUM(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * ({_BM25_K1} + 1.0))
               / (tf + {_BM25_K1} * ((1.0 - {_BM25_B}) + {_BM25_B} * dl / avgdl))
           ), 6) AS score
    FROM tfs JOIN dfreq USING (token) JOIN dls USING (id) CROSS JOIN n_avg
    GROUP BY id
    ORDER BY score DESC, id
    LIMIT 20
    """,
)
def q164_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 for a fixed bag of query terms —
    ranked retrieval (Robertson-Spärck Jones), the quality step above
    q161's boolean AND search. The engine path (operators/search.
    bm25_topk) scores ONLY the query terms' postings (filter before
    any join); N/avgdl ride a 1-row broadcast; the cut is
    TakeOrderedAndProject. Score rounded to 6 dp before the cut (the
    q130 libm-ULP rule; BM25 scores are strictly positive, so no -0.0
    trap). The oracle recomputes the identical formula from raw text."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=20, k1=_BM25_K1, b=_BM25_B)


# --------------------------------------------------------------------------
# q165 — count-min sketch point-frequency estimates
# --------------------------------------------------------------------------
_CMS_DEPTH, _CMS_WIDTH = 4, 256
_CMS_PROBES = [
    "join", "filter", "window", "spark", "table", "hash",
    "merge", "scan", "agg", "zzz_absent_token",
]


def _cms_oracle() -> str:
    probes = ", ".join(f"('{t}')" for t in _CMS_PROBES)
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    placed AS (
        SELECT r, CAST(('0x' || substr(md5(r || ':' || token), 1, 8)) AS BIGINT)
                  % {_CMS_WIDTH} AS bucket
        FROM toks, UNNEST(range(0, {_CMS_DEPTH})) AS t(r)
        WHERE token <> ''
    ),
    sketch AS (SELECT r, bucket, COUNT(*) AS c FROM placed GROUP BY 1, 2),
    probes(token) AS (VALUES {probes}),
    pb AS (
        SELECT token, r,
               CAST(('0x' || substr(md5(r || ':' || token), 1, 8)) AS BIGINT)
               % {_CMS_WIDTH} AS bucket
        FROM probes, UNNEST(range(0, {_CMS_DEPTH})) AS t(r)
    ),
    est AS (
        SELECT pb.token, MIN(COALESCE(s.c, 0)) AS cms_est
        FROM pb LEFT JOIN sketch s ON s.r = pb.r AND s.bucket = pb.bucket
        GROUP BY 1
    ),
    truth AS (
        SELECT p.token, COUNT(t.token) AS true_cnt
        FROM probes p LEFT JOIN toks t ON t.token = p.token
        GROUP BY 1
    )
    SELECT token, CAST(true_cnt AS BIGINT) AS true_cnt,
           CAST(cms_est AS BIGINT) AS cms_est
    FROM est JOIN truth USING (token)
    ORDER BY token
    """


@query("q165_count_min_sketch", oracle=_cms_oracle())
def q165_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, probed with a
    fixed key list (including one absent key): (token, true_cnt,
    cms_est) with est >= truth always and the depth-min bounding the
    collision overshoot. The sketch is depth x width = {d}x{w} counter
    rows — REAGGREGABLE partial state (shard sketches re-sum into the
    corpus sketch), which is the whole point at 100 TB: point
    frequencies without keeping the unbounded key dictionary. Counter
    placement uses the engine-portable md5 bucket hash
    (operators/sketches.cms_bucket), so the oracle reproduces every
    collision exactly.""".format(d=_CMS_DEPTH, w=_CMS_WIDTH)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    sketch = cms_build(toks, "token", _CMS_DEPTH, _CMS_WIDTH)
    probes = spark.createDataFrame([(t,) for t in _CMS_PROBES], "token string")
    est = cms_estimate(sketch, probes, "token", _CMS_DEPTH, _CMS_WIDTH)
    truth = (
        probes.join(toks.withColumn("__one", F.lit(1)), "token", "left")
        .groupBy("token")
        .agg(F.count("__one").alias("true_cnt"))
    )
    return (
        est.join(truth, "token")
        .select("token", "true_cnt", "cms_est")
        .orderBy("token")
    )


# --------------------------------------------------------------------------
# q166 — k-anonymity / l-diversity release audit
# --------------------------------------------------------------------------
_KANON_K = 5


@query(
    "q166_k_anonymity",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS class_size,
           COUNT(DISTINCT FLOOR(c_acctbal / 1000)) AS l_diversity,
           COUNT(*) < {_KANON_K} AS at_risk
    FROM customer
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q166_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + l-diversity audit of the customer table under the
    quasi-identifier (nation, market segment), sensitive attribute =
    account-balance band: one row per equivalence class with its size,
    sensitive diversity, and an at_risk flag for classes below k={k}.
    The release gate a GDPR pipeline runs AFTER pseudonymization
    (q148): pseudonyms stop direct lookup, this catches re-
    identification through quasi-identifier combinations. One keyed
    aggregate, output bounded by the quasi-value cross product
    (operators/privacy.k_anonymity_report).""".format(k=_KANON_K)
    cust = load_table(spark, sf_dir, "customer")
    banded = cust.withColumn("__band", F.floor(F.col("c_acctbal") / 1000))
    return (
        k_anonymity_report(banded, ["c_nationkey", "c_mktsegment"], "__band", k=_KANON_K)
        .orderBy("c_nationkey", "c_mktsegment")
    )


# --------------------------------------------------------------------------
# q167 — per-source n-gram novelty attribution (data valuation)
# --------------------------------------------------------------------------
@query(
    "q167_source_novelty",
    oracle="""
    WITH grams AS (
        SELECT DISTINCT source,
               a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS gram
        FROM (SELECT source, string_split(text, ' ') AS a FROM documents),
             UNNEST(range(1, len(a) - 1)) AS r(i)
    ),
    owner AS (SELECT gram, MIN(source) AS first_source FROM grams GROUP BY gram)
    SELECT g.source,
           COUNT(*) AS n_grams,
           COUNT(CASE WHEN o.first_source = g.source THEN 1 END) AS n_novel,
           ROUND(COUNT(CASE WHEN o.first_source = g.source THEN 1 END)
                 * 1.0 / COUNT(*), 6) AS novelty_rate
    FROM grams g JOIN owner o USING (gram)
    GROUP BY g.source
    ORDER BY g.source
    """,
)
def q167_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What does each source ADD to the corpus? Every distinct word-
    3-gram is attributed to its first owner under a fixed priority
    (source name order — deterministic, engine-portable); per source:
    distinct grams, grams it alone introduces, novelty rate. The
    data-valuation complement of q134's pairwise overlap: overlap says
    sources share material, novelty says which source you could DROP
    with least loss. Shape: the distinct (source, gram) relation feeds
    one gram-keyed min-aggregate and one source-keyed rollup — two
    bounded shuffles, never a per-pair comparison (novelty rate is
    strictly in (0, 1] — no -0.0 trap)."""
    from tp_integ_data_pipeline_spark.plans.curation import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("source", F.split("text", " ").alias("w"))
        .select("source", F.explode(word_ngrams("w", 3)).alias("gram"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds owner agg AND the rollup
    )
    owner = grams.groupBy("gram").agg(F.min("source").alias("first_source"))
    return (
        grams.join(owner, "gram")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("first_source") == F.col("source"), 1)).alias("n_novel"),
            F.round(
                F.count(F.when(F.col("first_source") == F.col("source"), 1))
                * F.lit(1.0)
                / F.count(F.lit(1)),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("source")
    )
