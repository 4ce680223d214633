"""Round-10 incremental corpus-refresh capstone (q255–q257):
first-fail admission attribution, consistency of the dedup probe with
the existing-kept corpus, mixture-report identities (capacity solve +
temperature target), and the packing CONTINUATION property — batch-wise
packing with one integer of carried state is bit-identical to packing
the whole corpus at once."""

from __future__ import annotations

from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.plans.registry import QUERIES
from tp_integ_data_pipeline_spark.plans.round10_queries import (
    _ADMIT_IDX,
    _PACK_BUDGET,
    _R_STAGES,
    _admission,
    _exist_kept,
)
from tp_integ_data_pipeline_spark.sources.fixtures import load_table

_PRIORITY = [
    ("f_dup_batch", 2),
    ("f_dup_corpus", 3),
    ("f_short", 4),
    ("f_quality", 5),
    ("f_contam", 6),
]


def _mid(spark, sf_dir) -> int:
    return (
        load_table(spark, sf_dir, "documents").agg(F.max("doc_id")).first()[0]
        // 2
    )


def test_q255_first_fail_and_conservation(spark, sf_dir):
    rows = QUERIES["q255_refresh_admission"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    mid = _mid(spark, sf_dir)
    new_half = docs.where(F.col("doc_id") >= mid)
    # one row per arriving doc — admitted AND rejected both appear
    assert len(rows) == new_half.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    n_bench = new_half.where(F.col("doc_id") % 97 == 0).count()
    assert sum(1 for r in rows if r.stage_idx == 1) == n_bench
    for r in rows:
        flags = {c: getattr(r, c) for c, _ in _PRIORITY}
        assert r.n_fail == sum(flags.values())
        assert r.stage == _R_STAGES[r.stage_idx - 1]
        if r.stage_idx == 1:  # bench rows carry no verdict flags
            assert r.n_fail == 0 and r.admitted == 0
        elif r.stage_idx == _ADMIT_IDX:
            assert r.n_fail == 0 and r.admitted == 1
        else:  # first failing flag in pipeline order wins
            first = next(idx for c, idx in _PRIORITY if flags[c] == 1)
            assert r.stage_idx == first and r.admitted == 0


def test_q255_dup_corpus_matches_exist_kept(spark, sf_dir):
    """The dup_vs_corpus verdict is EXACTLY membership of the doc's
    text in the existing-kept corpus — the q109 ingest-dedup decision,
    doc for doc."""
    kept_texts = {r.text for r in _exist_kept(spark, sf_dir).collect()}
    adm = _admission(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in adm:
        if not r.is_bench:
            assert r.dup_corpus == (docs[r.doc_id] in kept_texts)


def test_q256_mixture_identities(spark, sf_dir):
    rows = QUERIES["q256_refresh_mixture"](spark, sf_dir).collect()
    assert all(r.n_after == r.n_before + r.n_added for r in rows)
    assert all(r.n_after >= 1 for r in rows)  # a listed source has mass
    assert abs(sum(r.share_after for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-4
    # capacity solve: the smallest source keeps everything, every
    # keep_frac is a valid fraction, and keep_frac shrinks as the
    # source grows (sqrt(min_n / n) is decreasing in n)
    assert all(0.0 < r.keep_frac <= 1.0 for r in rows)
    smallest = min(rows, key=lambda r: r.n_after)
    assert smallest.keep_frac == 1.0
    by_size = sorted(rows, key=lambda r: r.n_after)
    for a, b in zip(by_size, by_size[1:]):
        assert a.keep_frac >= b.keep_frac
    # drift telescopes: deltas sum to ~0 (both share columns sum to 1)
    assert abs(sum(r.share_delta for r in rows)) < 1e-4


def test_q257_continuation_bit_identical(spark, sf_dir):
    """THE carried-state contract (operators/packing.py): packing the
    admitted batch with start_offset = yesterday's token total must
    give the SAME (seq_id, seq_offset) per doc as packing yesterday's
    corpus and the batch together in one shot."""
    from tp_integ_data_pipeline_spark.operators.packing import pack_sequences

    kept = _exist_kept(spark, sf_dir).select("doc_id", "n_words")
    admitted = (
        _admission(spark, sf_dir)
        .filter(F.col("stage_idx") == _ADMIT_IDX)
        .select("doc_id", "n_words")
    )
    whole = pack_sequences(
        kept.unionByName(admitted), _PACK_BUDGET, token_count_col="n_words"
    )
    mid = _mid(spark, sf_dir)
    whole_batch_part = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in whole.where(F.col("doc_id") >= mid).collect()
    }
    got = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in QUERIES["q257_refresh_packing"](spark, sf_dir).collect()
    }
    assert got == whole_batch_part


def test_q257_geometry_and_carried_offset(spark, sf_dir):
    rows = sorted(
        QUERIES["q257_refresh_packing"](spark, sf_dir).collect(),
        key=lambda r: r.doc_id,
    )
    off0 = (
        _exist_kept(spark, sf_dir).agg(F.sum("n_words")).first()[0] or 0
    )
    assert rows, "refresh admitted nothing — corpus fixture degenerated"
    # the first admitted doc lands exactly where yesterday stopped
    assert rows[0].seq_id == off0 // _PACK_BUDGET
    assert rows[0].seq_offset == off0 % _PACK_BUDGET
    # offsets are in-range and the layout is the running token sum
    pos = off0
    for r in rows:
        assert 0 <= r.seq_offset < _PACK_BUDGET
        assert r.seq_id == pos // _PACK_BUDGET
        assert r.seq_offset == pos % _PACK_BUDGET
        pos += r.n_tokens


def test_refresh_empty_existing_half_matches_oracle(spark, tmp_path):
    """max(doc_id)=1 → mid=0 → the standing corpus is EMPTY: nothing
    is dup_vs_corpus, the carried offset is 0, and packing starts at
    sequence 0 — verified against the DuckDB oracle on both q255 and
    q257 (the first-ever-refresh boundary)."""
    import duckdb

    from tp_integ_data_pipeline_spark.plans.registry import ORACLES

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s1", 50),
            (1, "one two three four five six seven eight nine ten eleven", "en", "s1", 46),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.toPandas().to_parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    for qname in (
        "q255_refresh_admission",
        "q256_refresh_mixture",  # tb=0: share_before pinned 0.0, no throw
        "q257_refresh_packing",
    ):
        got = [tuple(r) for r in QUERIES[qname](spark, str(tmp_path)).collect()]
        exp = [tuple(r) for r in con.execute(ORACLES[qname]).fetchall()]
        assert got == exp, qname
    # doc 0 is bench (0 % 97 == 0); doc 1 arrives at an empty corpus
    adm = {r.doc_id: r for r in QUERIES["q255_refresh_admission"](spark, str(tmp_path)).collect()}
    assert adm[0].stage_idx == 1
    assert adm[1].f_dup_corpus == 0 and adm[1].admitted == 1
    pack = QUERIES["q257_refresh_packing"](spark, str(tmp_path)).collect()
    assert len(pack) == 1 and pack[0].seq_id == 0 and pack[0].seq_offset == 0
