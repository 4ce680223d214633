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
