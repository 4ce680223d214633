"""Training-shard writer: layout, determinism, pruning, sortedness."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.sources.shards import (
    read_shard,
    shard_id,
    write_training_shards,
)


def test_shard_layout_and_sortedness(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tempfile.mkdtemp(prefix="shards_")
    write_training_shards(docs, out, key_col="doc_id", n_shards=8)

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs and len(dirs) <= 8
    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    # every row sits in the shard its key hashes to
    mismatched = back.filter(
        F.col("shard").cast("int") != shard_id("doc_id", 8)
    ).count()
    assert mismatched == 0

    # rows inside each parquet file are sorted by the key
    for d in dirs:
        for f in os.listdir(os.path.join(out, d)):
            if not f.endswith(".parquet"):
                continue
            ids = [
                r.doc_id
                for r in spark.read.parquet(os.path.join(out, d, f))
                .select("doc_id")
                .collect()
            ]
            assert ids == sorted(ids)


def test_shard_assignment_survives_rewrite(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a, b = tempfile.mkdtemp(prefix="sh_a"), tempfile.mkdtemp(prefix="sh_b")
    write_training_shards(docs, a, n_shards=8)
    # rewrite with a filtered superset ordering: membership must agree
    write_training_shards(docs.orderBy(F.rand(seed=7)), b, n_shards=8)
    da = {r.doc_id: r.shard for r in spark.read.parquet(a).select("doc_id", "shard").collect()}
    db = {r.doc_id: r.shard for r in spark.read.parquet(b).select("doc_id", "shard").collect()}
    assert da == db


def test_read_shard_prunes_partitions(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tempfile.mkdtemp(prefix="shards_")
    write_training_shards(docs, out, n_shards=8)
    one = read_shard(spark, out, 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter reached the scan (only shard=3 dirs listed);
    # DataFilters stays empty — nothing is row-filtered after the scan
    assert "PartitionFilters: [isnotnull(shard" in plan
    assert "= 3)" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    expected = docs.filter(shard_id("doc_id", 8) == 3).count()
    assert one.count() == expected
