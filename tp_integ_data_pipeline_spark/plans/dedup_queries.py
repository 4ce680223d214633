"""Dedup queries (X1/X2) over the `documents` / `embeddings` fixtures.

Oracle note: the LSH query's oracle is the EXACT pairwise Jaccard —
valid because the band scheme's miss probability at the 0.6 threshold
is < 1e-12 (operators/dedup.py), i.e. LSH+verify equals exact output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.dedup import (
    NUM_PERM,
    dup_clusters,
    dup_stats,
    minhash_near_dup_pairs,
    minhash_signatures,
    pair_jaccard,
    shingles,
    simhash_near_dup_pairs,
)
from tp_integ_data_pipeline_spark.operators.similarity import cosine_pairs
from tp_integ_data_pipeline_spark.plans.registry import query
from tp_integ_data_pipeline_spark.sources.fixtures import load_table, scratch_dir

# The verified MinHash-LSH pair relation (k=3, t=0.6 over the full
# documents table) feeds FIVE registered queries (q42 pairs, q87/q110
# clusterings, q90 removal, q111 leakage-safe split) — share one
# lazily-checkpointed copy per (session, corpus), and likewise the
# connected-components labeling built on it (the q175/q185 ordered-sets
# discipline, plans/session_cache.py). Each consumer still expresses
# the full logical plan; the oracle differential is unaffected.
def _corpus_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (id, sig, n) MinHash signatures of the FULL
    documents table (k=3, NUM_PERM) — the threshold- AND split-
    independent feature prework under every MinHash consumer: the
    batch pair relation (_minhash_pairs → q42/q87/q90/q110/q111) and
    the incremental index (q103's add takes the id < mid slice, its
    probe the rest). Fixed-width rows (NUM_PERM longs + n per doc), so
    the lazy checkpoint is index-sized, never corpus-text-sized."""
    from tp_integ_data_pipeline_spark.plans.session_cache import session_cached

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        sh = shingles(docs, "doc_id", "text", k=3)
        return minhash_signatures(
            sh, num_perm=NUM_PERM, with_sizes=True
        ).localCheckpoint(eager=False)

    return session_cached(spark, "minhash_sigs", (sf_dir,), build)


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_integ_data_pipeline_spark.plans.session_cache import session_cached

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return minhash_near_dup_pairs(
            docs, "doc_id", "text", k=3, threshold=0.6,
            sig=_corpus_sigs(spark, sf_dir),
        ).localCheckpoint(eager=False)

    return session_cached(spark, "minhash_pairs", (sf_dir,), build)


def _minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tp_integ_data_pipeline_spark.plans.session_cache import session_cached

    def build() -> DataFrame:
        return dup_clusters(
            _minhash_pairs(spark, sf_dir).select("a", "b")
        ).localCheckpoint(eager=False)

    return session_cached(spark, "minhash_clusters", (sf_dir,), build)


# DuckDB CTEs mirroring operators.dedup.shingles / pair_jaccard (k=3).
_SHINGLE_CTES = """
WITH sh AS (
    SELECT DISTINCT doc_id AS id, array_to_string(toks[i:i+2], ' ') AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         UNNEST(range(1, greatest(len(toks) - 1, 1))) AS u(i)
),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
p AS (
    SELECT a.id AS a, b.id AS b, COUNT(*) AS inter
    FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
    GROUP BY 1, 2
),
scored AS (
    SELECT p.a, p.b, p.inter,
           sa.n + sb.n - p.inter AS uni,
           CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS jaccard
    FROM p JOIN sizes sa ON p.a = sa.id JOIN sizes sb ON p.b = sb.id
)
"""


@query(
    "q40_dedup_exact_stats",
    oracle="""
    SELECT COUNT(*) AS n_distinct,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_duplicates,
           MAX(c) AS max_group
    FROM (SELECT COUNT(*) AS c FROM documents GROUP BY text)
    """,
)
def q40_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dup_stats(docs, ["text"])


@query(
    "q41_ngram_jaccard_topk",
    oracle=_SHINGLE_CTES
    + """
    SELECT a, b, inter, uni, jaccard FROM scored
    ORDER BY jaccard DESC, a, b
    LIMIT 20
    """,
)
def q41_ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # The exact all-pairs path consumes the shingle relation from three
    # branches (self-join a/b + sizes); pinning it lazily is fine HERE
    # because pair_jaccard(pairs=None) is by contract the
    # small-corpus/verification tool (the 100 TB near-dup paths are
    # LSH/IVF) — the same corpus-sized pin is deliberately NOT taken
    # inside minhash_near_dup_pairs. Measured ~15% at sf0.1.
    sh = shingles(docs, "doc_id", "text", k=3).localCheckpoint(eager=False)
    return pair_jaccard(sh).orderBy(F.col("jaccard").desc(), "a", "b").limit(20)


@query(
    "q42_minhash_lsh_pairs",
    oracle=_SHINGLE_CTES
    + """
    SELECT a, b, inter, uni, jaccard FROM scored
    WHERE jaccard >= 0.6
    ORDER BY a, b
    """,
)
def q42_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs(spark, sf_dir).orderBy("a", "b")


def _simhash_oracle(max_hamming: int = 3) -> str:
    """Full SQL replay of the SimHash pipeline (hash-checked since the
    round-6 switch to the portable two-segment md5 token hash): 64
    conditional bit sums, signature assembly with the bit-63 sign-wrap
    spelled as a literal (DuckDB's checked shift would overflow where
    Spark's shiftleft wraps), 16-bit-chunk pigeonhole candidates, and
    bit_count(xor) Hamming verify — identical arithmetic to
    operators/dedup.simhash_signatures/simhash_near_dup_pairs."""
    bit_sums = ",\n               ".join(
        f"SUM(CASE WHEN ({'h1' if i < 32 else 'h2'} >> {i % 32}) & 1 = 1"
        f" THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    terms = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({(1 << i) if i < 63 else -(1 << 63)} AS BIGINT)"
        f" ELSE 0 END"
        for i in range(64)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    h AS (
        SELECT id,
               CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h1,
               CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h2
        FROM toks
    ),
    bits AS (
        SELECT id,
               {bit_sums}
        FROM h GROUP BY id
    ),
    sig AS (SELECT id, {terms} AS simhash FROM bits),
    chunks AS (
        SELECT id, simhash, j AS chunk_id, (simhash >> (16 * j)) & 65535 AS chunk
        FROM sig, UNNEST(range(0, 4)) t(j)
    ),
    cand AS (
        SELECT DISTINCT a.id AS a, b.id AS b, a.simhash AS sa, b.simhash AS sb
        FROM chunks a JOIN chunks b
          ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk AND a.id < b.id
    )
    SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    ORDER BY a, b
    """


@query("q43_simhash_pairs", oracle=_simhash_oracle(3))
def q43_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3).orderBy("a", "b")


@query(
    "q44_embedding_near_dup",
    oracle="""
    SELECT a, b, round(cos, 6) AS cos6
    FROM (
        SELECT a.vec_id AS a, b.vec_id AS b,
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    WHERE cos >= 0.45
    ORDER BY a, b
    """,
)
def q44_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs(emb, threshold=0.45).orderBy("a", "b")


@query(
    "q87_dup_clusters",
    # Transitive closure via recursive CTE over the exact-Jaccard edge
    # list (same ≥0.6 edges as q42; LSH misses nothing there, see the
    # band-probability note at the top of operators/dedup.py), then
    # cluster id = min reachable node — identical convention to
    # dup_clusters' min-label propagation.
    oracle=_SHINGLE_CTES.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    + """
    , edges AS (SELECT a, b FROM scored WHERE jaccard >= 0.6),
    sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    reach(src, dst) AS (
        SELECT a AS src, a AS dst FROM sym
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    )
    SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src
    ORDER BY id
    """,
)
def q87_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_clusters(spark, sf_dir).orderBy("id")


@query(
    "q90_corpus_dedup",
    # End-to-end near-dup REMOVAL — the user-facing training-data op:
    # LSH pairs → connected components → keep the min-id doc per
    # cluster (singletons untouched) → corpus summary.
    oracle=_SHINGLE_CTES.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    + """
    , edges AS (SELECT a, b FROM scored WHERE jaccard >= 0.6),
    sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    reach(src, dst) AS (
        SELECT a AS src, a AS dst FROM sym
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ),
    clusters AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src),
    removed AS (SELECT id FROM clusters WHERE id <> cluster),
    kept AS (SELECT * FROM documents WHERE doc_id NOT IN (SELECT id FROM removed))
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           COUNT(*) AS n_kept,
           (SELECT COUNT(*) FROM documents) - COUNT(*) AS n_removed,
           CAST(SUM(doc_id) AS BIGINT) AS kept_id_checksum
    FROM kept
    """,
)
def q90_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline a 100 TB corpus runs before training:
    bucketed LSH candidates (no all-pairs), estimate-filtered exact
    verification, distributed connected components, then an anti-join
    drop of non-canonical members — every stage shuffle-bounded; the
    only driver actions are the component-convergence counts."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = _minhash_clusters(spark, sf_dir)
    drop = clusters.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias("doc_id")
    )
    kept = docs.join(drop, "doc_id", "left_anti")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        kept.agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("kept_id_checksum"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_removed"),
            "kept_id_checksum",
        )
    )


@query(
    "q111_leakage_safe_split",
    # Cluster-aware split: the split key is the near-dup cluster's
    # min-id representative (singleton → own id), q76's md5-digit
    # convention — so a duplicate cluster can never straddle
    # train/val/test (eval contamination by near-copies).
    oracle=_SHINGLE_CTES.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    + """
    , edges AS (SELECT a, b FROM scored WHERE jaccard >= 0.6),
    sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    reach(src, dst) AS (
        SELECT a AS src, a AS dst FROM sym
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ),
    clusters AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src),
    assigned AS (
        SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS rep
        FROM documents d LEFT JOIN clusters c ON d.doc_id = c.id
    ),
    sp AS (
        SELECT doc_id,
               CASE WHEN dg < 12 THEN 'train' WHEN dg < 14 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 1)) AS INT) AS dg
              FROM assigned)
    )
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM sp GROUP BY 1 ORDER BY 1
    """,
)
def q111_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cluster-aware train/val/test split
    (operators/dedup.leakage_safe_split): membership is decided by the
    cluster representative's hash, so near-copies always share a
    split. The exact per-split id-set (checksummed) must match the
    oracle's recomputation."""
    from tp_integ_data_pipeline_spark.operators.dedup import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    clusters = _minhash_clusters(spark, sf_dir)
    assigned = leakage_safe_split(docs, clusters, "doc_id")
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("id").cast("long").alias("id_checksum"),
        )
        .orderBy("split")
    )


@query(
    "q110_cluster_canonicals",
    # Keep-BEST canonical selection: same clusters as q87, but the
    # kept member is the longest document (n_chars desc, id tiebreak) —
    # the policy a curation pipeline wants when duplicates differ in
    # cleanliness, vs q90's keep-min-id convention.
    oracle=_SHINGLE_CTES.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    + """
    , edges AS (SELECT a, b FROM scored WHERE jaccard >= 0.6),
    sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    reach(src, dst) AS (
        SELECT a AS src, a AS dst FROM sym
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ),
    clusters AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY src)
    SELECT c.id, c.cluster,
           (ROW_NUMBER() OVER (PARTITION BY c.cluster
                               ORDER BY d.n_chars DESC, c.id) = 1) AS keep
    FROM clusters c JOIN documents d ON c.id = d.doc_id
    ORDER BY c.id
    """,
)
def q110_cluster_canonicals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ordered canonical pick per duplicate cluster
    (operators/dedup.cluster_canonicals): keep the longest member,
    doc_id as tiebreak. One bounded window per cluster."""
    from tp_integ_data_pipeline_spark.operators.dedup import cluster_canonicals

    docs = load_table(spark, sf_dir, "documents")
    clusters = _minhash_clusters(spark, sf_dir)
    return cluster_canonicals(
        clusters,
        docs.select("doc_id", "n_chars"),
        "doc_id",
        [F.col("n_chars").desc(), F.col("id")],
    ).orderBy("id")


# DuckDB CTEs mirroring operators.substring.duplicated_spans (k=20):
# every-position 20-gram md5 → global count ≥ 2 → gaps-and-islands
# span merge per doc. The md5 fingerprint step makes the whole
# operator SQL-expressible, unlike MinHash.
_SUBSTR_CTES = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
    SELECT doc_id, i - 1 AS pos, md5(array_to_string(w[i:i+19], ' ')) AS gh
    FROM words, UNNEST(range(1, greatest(len(w) - 19, 0) + 1)) AS t(i)
),
dupg AS (
    SELECT gh FROM (SELECT gh, COUNT(*) AS c FROM grams GROUP BY gh) WHERE c >= 2
),
marked AS (SELECT doc_id, pos FROM grams WHERE gh IN (SELECT gh FROM dupg)),
brk AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
                THEN 0 ELSE 1 END AS b
    FROM marked
),
runs AS (
    SELECT doc_id, pos,
           SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS run_id
    FROM brk
),
spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) + 20 AS e
    FROM runs GROUP BY doc_id, run_id
)
"""


@query(
    "q105_substring_spans",
    oracle=_SUBSTR_CTES
    + """
    SELECT doc_id AS id,
           CAST(s AS BIGINT) AS span_start,
           CAST(e AS BIGINT) AS span_end,
           CAST(e - s AS BIGINT) AS span_len
    FROM spans
    ORDER BY id, span_start
    """,
)
def q105_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup (Lee et al. 2022 ExactSubstr, token
    granularity): the maximal duplicated runs of ≥ 20 tokens across the
    corpus, via position-k-gram md5 fingerprints → global count ≥ 2 →
    per-doc gaps-and-islands merge (operators/substring.py). Two
    shuffles on fixed-width rows; the only windows are per-doc."""
    from tp_integ_data_pipeline_spark.operators.substring import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicated_spans(docs, "doc_id", "text", k=20)
    return spans.select(
        "id",
        F.col("span_start").cast("long"),
        F.col("span_end").cast("long"),
        F.col("span_len").cast("long"),
    ).orderBy("id", "span_start")


@query(
    "q106_substring_strip",
    oracle=_SUBSTR_CTES
    + """
    , tok AS (
        SELECT doc_id, w[i] AS tok, i - 1 AS idx
        FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
    ),
    kept AS (
        SELECT t.doc_id, t.idx, t.tok FROM tok t
        WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.doc_id = t.doc_id AND t.idx >= s.s AND t.idx < s.e
        )
    ),
    reb AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS txt,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           md5(COALESCE(r.txt, '')) AS stripped_md5,
           CAST(len(string_split(d.text, ' ')) - COALESCE(r.n_kept, 0) AS BIGINT)
               AS n_removed_tokens
    FROM documents d LEFT JOIN reb r ON d.doc_id = r.doc_id
    ORDER BY d.doc_id
    """,
)
def q106_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The follow-through cut: remove every ≥20-token duplicated span
    found by q105's operator and rebuild each document from the
    surviving tokens in order (row-local after one bounded span
    aggregation per doc). The md5 of every rebuilt document must match
    the oracle's — proving span offsets AND reassembly order exact."""
    from tp_integ_data_pipeline_spark.operators.substring import (
        duplicated_spans,
        strip_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicated_spans(docs, "doc_id", "text", k=20)
    stripped = strip_spans(docs, spans, "doc_id", "text")
    return stripped.select(
        F.col("id").alias("doc_id"),
        F.md5("text").alias("stripped_md5"),
        "n_removed_tokens",
    ).orderBy("doc_id")


@query(
    "q109_stream_corpus_dedup",
    # Two-micro-batch streaming corpus dedup (halves split at
    # max_id/2, like q103), cross-corpus decisions EXACTLY verified
    # (verify="exact") so the whole composition is oracle-able:
    # within-batch near-dup clusters keep their min id; a batch-2
    # survivor is dropped iff it ≥0.6-Jaccard-matches a batch-1
    # SURVIVOR (only survivors enter the index). LSH ≥0.6 == exact
    # (band-probability note, operators/dedup.py).
    oracle=_SHINGLE_CTES.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    + """
    , mid AS (SELECT MAX(doc_id) // 2 AS m FROM documents),
    e1 AS (
        SELECT a, b FROM scored
        WHERE jaccard >= 0.6 AND b < (SELECT m FROM mid)
    ),
    sym1 AS (SELECT a, b FROM e1 UNION SELECT b, a FROM e1),
    reach1(src, dst) AS (
        SELECT a AS src, a AS dst FROM sym1
        UNION
        SELECT r.src, s.b FROM reach1 r JOIN sym1 s ON r.dst = s.a
    ),
    cl1 AS (SELECT src AS id, MIN(dst) AS cluster FROM reach1 GROUP BY src),
    kept1 AS (
        SELECT doc_id FROM documents
        WHERE doc_id < (SELECT m FROM mid)
          AND doc_id NOT IN (SELECT id FROM cl1 WHERE id <> cluster)
    ),
    e2 AS (
        SELECT a, b FROM scored
        WHERE jaccard >= 0.6 AND a >= (SELECT m FROM mid)
    ),
    sym2 AS (SELECT a, b FROM e2 UNION SELECT b, a FROM e2),
    reach2(src, dst) AS (
        SELECT a AS src, a AS dst FROM sym2
        UNION
        SELECT r.src, s.b FROM reach2 r JOIN sym2 s ON r.dst = s.a
    ),
    cl2 AS (SELECT src AS id, MIN(dst) AS cluster FROM reach2 GROUP BY src),
    kept2 AS (
        SELECT doc_id FROM documents
        WHERE doc_id >= (SELECT m FROM mid)
          AND doc_id NOT IN (SELECT id FROM cl2 WHERE id <> cluster)
    ),
    crossdrop AS (
        SELECT DISTINCT s.b AS id
        FROM scored s
        JOIN kept1 k1 ON s.a = k1.doc_id
        JOIN kept2 k2 ON s.b = k2.doc_id
        WHERE s.jaccard >= 0.6
    ),
    kept AS (
        SELECT doc_id FROM kept1
        UNION ALL
        SELECT doc_id FROM kept2 WHERE doc_id NOT IN (SELECT id FROM crossdrop)
    )
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS kept_id_checksum
    FROM kept
    """,
)
def q109_stream_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus dedup end-to-end (streaming/dedup_ingest.py):
    the corpus arrives as two micro-batches; each batch is deduped
    within itself (LSH pairs → clusters → keep min id), then against
    everything already ingested via the incremental index probe with
    exact verification, then appended to the lake and indexed. The
    final lake must equal the oracle's two-phase dedup — hard evidence
    the ingest-time composition matches batch semantics."""
    
    from tp_integ_data_pipeline_spark.operators.neardup_index import NearDupIndex
    from tp_integ_data_pipeline_spark.sources.lake import DataLake
    from tp_integ_data_pipeline_spark.streaming.dedup_ingest import (
        dedup_ingest_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.agg(F.max("doc_id")).first()[0] // 2  # 1-value scalar
    lake = DataLake(spark, scratch_dir(prefix="stream_dedup_lake_"))
    idx = NearDupIndex(spark, scratch_dir(prefix="stream_dedup_idx_"))
    for half in (
        docs.filter(F.col("doc_id") < mid),
        docs.filter(F.col("doc_id") >= mid),
    ):
        dedup_ingest_batch(half, lake, "docs", idx, verify="exact")
    kept = lake.read("docs")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        kept.agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("kept_id_checksum"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select("n_docs", "n_kept", "kept_id_checksum")
    )


@query(
    "q108_substring_winnowed",
    # Same pipeline as q105 but over WINNOWED fingerprints (w=4): keep a
    # position only where its hash is the minimum of the 4-hash window
    # starting there (Schleimer et al. winnowing) — the 1/w-index-size
    # scale path. Deterministic and SQL-expressible, so unlike MinHash
    # the approximation itself gets a hard oracle.
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT doc_id, i - 1 AS pos, md5(array_to_string(w[i:i+19], ' ')) AS gh
        FROM words, UNNEST(range(1, greatest(len(w) - 19, 0) + 1)) AS t(i)
    ),
    winnowed AS (
        SELECT doc_id, pos, gh FROM (
            SELECT doc_id, pos, gh,
                   MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
            FROM grams
        ) WHERE gh = wmin
    ),
    dupg AS (
        SELECT gh FROM (SELECT gh, COUNT(*) AS c FROM winnowed GROUP BY gh)
        WHERE c >= 2
    ),
    marked AS (SELECT doc_id, pos FROM winnowed WHERE gh IN (SELECT gh FROM dupg)),
    brk AS (
        SELECT doc_id, pos,
               CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
                    THEN 0 ELSE 1 END AS b
        FROM marked
    ),
    runs AS (
        SELECT doc_id, pos,
               SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS run_id
        FROM brk
    )
    SELECT doc_id AS id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 20 AS BIGINT) AS span_end,
           CAST(MAX(pos) + 20 - MIN(pos) AS BIGINT) AS span_len
    FROM runs GROUP BY doc_id, run_id
    ORDER BY id, span_start
    """,
)
def q108_substring_winnowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed substring-dup detection (the 100 TB path: 1/w index
    rows vs q105's every-position index; the winnowing guarantee keeps
    every duplicated run of ≥ k+w−1 tokens detectable). Spans are
    detection-grade — fingerprint coverage, not exact cut offsets; the
    oracle reproduces the selection + merge bit-for-bit."""
    from tp_integ_data_pipeline_spark.operators.substring import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicated_spans(docs, "doc_id", "text", k=20, winnow=4)
    return spans.select(
        "id",
        F.col("span_start").cast("long"),
        F.col("span_end").cast("long"),
        F.col("span_len").cast("long"),
    ).orderBy("id", "span_start")


@query(
    "q103_incremental_neardup",
    # Oracle: the exact cross-split near-dup pairs — everything indexed
    # (doc_id < max_id/2) vs the incoming batch (the rest; the split
    # adapts to the SF so every scale exercises the path). Valid
    # because the probe's LSH+estimate candidates (same band scheme and
    # Hoeffding margin as q42) feed an EXACT pair_jaccard verification
    # over the retrieved texts, so index pruning is value-invisible.
    oracle=_SHINGLE_CTES
    + """
    SELECT a, b, inter, uni, jaccard FROM scored
    WHERE jaccard >= 0.6
      AND a < (SELECT MAX(doc_id) // 2 FROM documents)
      AND b >= (SELECT MAX(doc_id) // 2 FROM documents)
    ORDER BY a, b
    """,
)
def q103_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-corpus near-dup contract: an index built from already-
    ingested documents (id < 250) answers "which of these NEW documents
    (id >= 250) near-duplicate something ingested?" without rescanning
    ingested text — LSH bucket probe + signature-estimate prefilter
    (operators/neardup_index.py), then exact Jaccard verification by
    joining the candidate ids back to the corpus store. At 100 TB the
    index holds fixed-width rows (~1000× smaller than the text), and a
    probe touches only matching buckets."""
    
    from tp_integ_data_pipeline_spark.operators.dedup import pair_jaccard, shingles
    from tp_integ_data_pipeline_spark.operators.neardup_index import NearDupIndex

    docs = load_table(spark, sf_dir, "documents")
    # split point is a 1-value scalar (model-sized driver action)
    mid = docs.agg(F.max("doc_id")).first()[0] // 2
    old = docs.filter(F.col("doc_id") < mid)
    new = docs.filter(F.col("doc_id") >= mid)
    idx = NearDupIndex(spark, scratch_dir(prefix="neardup_idx_"))
    # the signature prework is the shared session-cached corpus
    # relation (same k/NUM_PERM as the index): add takes the indexed
    # slice, probe the batch slice — the feature pipeline runs once
    # per (session, corpus) across the whole MinHash family
    sigs = _corpus_sigs(spark, sf_dir)
    idx.add(old, sig=sigs.filter(F.col("id") < mid))
    sigma = (0.6 * 0.4 / idx.num_perm) ** 0.5
    cand = (
        idx.probe(new, sig=sigs.filter(F.col("id") >= mid))
        .filter(F.col("est_jaccard") >= 0.6 - 4.5 * sigma)
        .select(F.col("index_id").alias("a"), F.col("probe_id").alias("b"))
    )
    # Exact verification: resolve candidate ids against the corpus
    # store (the index holds no text) and score real shingle Jaccard.
    touched = docs.join(
        cand.select(F.col("a").alias("doc_id"))
        .union(cand.select(F.col("b").alias("doc_id")))
        .distinct(),
        "doc_id",
        "left_semi",
    )
    sh = shingles(touched, "doc_id", "text", k=3)
    return (
        pair_jaccard(sh, cand)
        .filter(F.col("jaccard") >= 0.6)
        .orderBy("a", "b")
    )
