"""Streaming near-dup ingest (streaming/dedup_ingest.py): the three
dedup stages, replay idempotence, and the T1 wrapper."""

from __future__ import annotations

from tp_integ_data_pipeline_spark.operators.neardup_index import NearDupIndex
from tp_integ_data_pipeline_spark.sources.lake import DataLake
from tp_integ_data_pipeline_spark.streaming.dedup_ingest import (
    dedup_ingest_batch,
    start_neardup_ingest,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
OTHER = "one two three four five six seven eight nine ten"
FRESH = "completely different words entirely novel content here indeed truly"


def test_dedup_ingest_batch_three_stages_and_replay(spark, tmp_path):
    lake = DataLake(spark, str(tmp_path / "lake"))
    idx = NearDupIndex(spark, str(tmp_path / "idx"))

    b1 = spark.createDataFrame(
        [
            (1, BASE),  # kept (cluster canonical)
            (2, BASE + " extra"),  # within-batch near-dup of 1 (j≈0.89) → dropped
            (3, OTHER),  # kept
            (3, OTHER),  # exact id re-delivery → dropped
        ],
        ["doc_id", "text"],
    )
    stats: dict = {}
    dedup_ingest_batch(b1, lake, "docs", idx, stats=stats)
    assert stats == {"arrived": 3, "kept": 2}  # dropDuplicates first → 3 arrive
    assert {r.doc_id for r in lake.read("docs").collect()} == {1, 3}

    # batch 2: cross-corpus near-dup (vs indexed doc 1) dropped, fresh kept
    b2 = spark.createDataFrame([(10, BASE), (11, FRESH)], ["doc_id", "text"])
    dedup_ingest_batch(b2, lake, "docs", idx)
    assert {r.doc_id for r in lake.read("docs").collect()} == {1, 3, 11}
    assert {r.id for r in idx.indexed_ids().collect()} == {1, 3, 11}

    # full replay of batch 2 (crash-after-commit redelivery): a no-op —
    # in particular doc 11 must NOT be flagged as a near-dup of its own
    # indexed copy
    dedup_ingest_batch(b2, lake, "docs", idx)
    assert {r.doc_id for r in lake.read("docs").collect()} == {1, 3, 11}
    assert idx.indexed_ids().count() == 3


def test_start_neardup_ingest_streaming_wrapper(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    # two files → two micro-batches (maxFilesPerTrigger=1); contents
    # disjoint across files so the result is batch-order-independent
    spark.createDataFrame(
        [(1, BASE), (2, BASE + " extra")], ["doc_id", "text"]
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(11, FRESH)], ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    lake = DataLake(spark, str(tmp_path / "lake"))
    idx = NearDupIndex(spark, str(tmp_path / "idx"))
    q = start_neardup_ingest(
        spark,
        src,
        schema,
        lake,
        "docs",
        idx,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = {r.doc_id for r in lake.read("docs").collect()}
    # one of the near-dup pair survives (the min id of whatever batch
    # saw them), the fresh doc always survives
    assert got == {1, 11}
    assert {r.id for r in idx.indexed_ids().collect()} == got


def test_index_remove_and_compact(spark, tmp_path):
    idx = NearDupIndex(spark, str(tmp_path / "idx_rm"))
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog wearing hat %d" % (i % 2))
         for i in range(10)],
        "doc_id long, text string",
    )
    idx.add(docs)
    batch = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog wearing hat 0")],
        "doc_id long, text string",
    )
    before = {r.index_id for r in idx.probe(batch).collect()}
    assert 0 in before and 2 in before
    # logical delete: probes and indexed_ids stop seeing the ids at once
    idx.remove(spark.createDataFrame([(0,), (2,)], "id long"))
    after = {r.index_id for r in idx.probe(batch).collect()}
    assert after == before - {0, 2}
    live = {r.id for r in idx.indexed_ids().collect()}
    assert live == set(range(10)) - {0, 2}
    # physical compact: same results, tombstones gone, rows dropped
    idx.compact()
    assert {r.index_id for r in idx.probe(batch).collect()} == after
    assert {r.id for r in idx.indexed_ids().collect()} == live
    sigs = spark.read.parquet(str(tmp_path / "idx_rm" / "sigs"))
    assert sigs.filter(sigs.id.isin([0, 2])).count() == 0
    # a removed id is re-addable after compaction
    idx.add(docs.filter("doc_id = 0"))
    assert 0 in {r.index_id for r in idx.probe(batch).collect()}


def test_index_compact_idempotent_and_empty(spark, tmp_path):
    idx = NearDupIndex(spark, str(tmp_path / "idx_c"))
    idx.compact()  # empty index + no tombstones: no-op
    idx.remove(spark.createDataFrame([(7,)], "id long"))
    idx.compact()  # tombstones against an empty index: clears them
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (7, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    idx.add(docs)
    assert {r.id for r in idx.indexed_ids().collect()} == {1, 7}
    idx.compact()  # nothing tombstoned: index unchanged
    assert {r.id for r in idx.indexed_ids().collect()} == {1, 7}
