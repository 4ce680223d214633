"""Plan-quality regression guards: the physical plans the 100 TB
design depends on (pushdown, pruning, broadcast) must not silently
degrade."""

from __future__ import annotations

from tp_integ_data_pipeline_spark import plans


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q01_filter_pushdown_and_pruning(spark):
    plan = _formatted(plans.QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001"))
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached parquet
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema  # unused columns pruned
    assert "l_quantity" in read_schema


def test_q00_broadcasts_dims(spark):
    plan = _formatted(plans.QUERIES["q00_flagship"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    # dims project only the needed columns at the scan
    assert "struct<c_custkey:bigint,c_nationkey:int>" in plan


def test_maybe_broadcast_gates_on_size(spark, sf_dir):
    """The stats gate, unit level: hint under threshold, no hint above."""
    from tp_integ_data_pipeline_spark.operators.joins import maybe_broadcast, plan_size_bytes
    from tp_integ_data_pipeline_spark.sources.fixtures import load_table

    c = load_table(spark, sf_dir, "customer")
    size = plan_size_bytes(c)
    assert size is not None and size > 0
    assert maybe_broadcast(c) is not c  # fixture-scale customer fits: hinted
    assert maybe_broadcast(c, threshold_bytes=1) is c  # oversized: unhinted


def test_small_sf_retains_bhj(spark):
    """At fixture scale the gated customer join must still plan as BHJ."""
    plan = _formatted(plans.QUERIES["q03_shipping_priority"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan


def test_oversized_dim_degrades_to_shuffle_join(spark):
    """Simulate the 100 TB regime where customer exceeds broadcast range
    (threshold -1): the gated plan must fall back to a shuffle join
    (SMJ/SHJ) instead of forcing a broadcast through a stale hint."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _formatted(plans.QUERIES["q03_shipping_priority"](spark, "/root/testdata/sf0.001"))
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q06_all_predicates_pushed(spark):
    plan = _formatted(plans.QUERIES["q06_forecast_revenue"](spark, "/root/testdata/sf0.001"))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, pushed


def test_all_query_plans_audit_gate(spark):
    """The full-registry audit as a GATE, not a report: build every
    registered query's physical plan at sf0.001 and assert

    - no CartesianProduct anywhere;
    - BroadcastNestedLoopJoin only where the audit allowlist documents
      a bounded broadcast side (1-row scalar aggregate or bounded query
      batch), and never more of them than documented;
    - no Window without data-column partition keys (a single-partition
      sort of the whole feeding relation — the q130 scale-killer)
      unless the feeding relation is a registered bounded summary
      (GLOBAL_WINDOW_ALLOWED documents each bound).

    Streaming queries run availableNow into a memory sink at build time
    and audit as memory scans — trivially clean, kept for coverage.
    """
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from audit_plans import (
        BNLJ_ALLOWED,
        GLOBAL_WINDOW_ALLOWED,
        audit_query,
        global_windows,
        verify_bnlj_bounds,
    )

    sf = "/root/testdata/sf0.001"
    offenders = []
    for name in plans.QUERIES:
        counters, plan = audit_query(spark, name, sf)
        if counters["cartesian"]:
            offenders.append((name, "CartesianProduct", counters["cartesian"]))
        gw = global_windows(plan)
        if gw and name not in GLOBAL_WINDOW_ALLOWED:
            offenders.append((name, "global-Window", gw))
        allowed = BNLJ_ALLOWED.get(name)
        if allowed is None:
            if counters["bnlj"]:
                offenders.append((name, "BroadcastNestedLoopJoin", counters["bnlj"]))
        else:
            # allowlisted: verify the documented bound STRUCTURALLY —
            # each BNLJ broadcast side must be a Keys:[] scalar
            # aggregate or the documented constant-filtered batch.
            violations = verify_bnlj_bounds(plan, allowed)
            if violations:
                offenders.append((name, "BNLJ-bound", violations))
    assert not offenders, offenders


def test_verify_bnlj_bounds_rejects_data_sized_broadcast(spark):
    """The allowlist cannot shelter a real nested-loop: a BNLJ whose
    broadcast side is a data relation (no Keys:[] aggregate, no
    documented filter) must produce a violation even when the query
    name is allowlisted."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from audit_plans import verify_bnlj_bounds

    cross = spark.range(100).crossJoin(spark.range(100).withColumnRenamed("id", "id2"))
    plan = _formatted(cross)
    if "BroadcastNestedLoopJoin" not in plan:
        return  # planner picked CartesianProduct — covered by the other gate
    violations = verify_bnlj_bounds(plan, {"scalar_aggs": 1, "filtered_batches": []})
    assert violations, plan

    # and a genuine 1-row aggregate side passes
    scalar = spark.range(100).agg({"id": "max"})
    ok_plan = _formatted(spark.range(100).crossJoin(scalar))
    if "BroadcastNestedLoopJoin" in ok_plan:
        assert verify_bnlj_bounds(ok_plan, {"scalar_aggs": 1, "filtered_batches": []}) == []


def test_global_windows_detector(spark):
    """The detector itself: flags empty AND constant partition specs
    (both funnel everything into one partition), passes keyed windows
    with or without an order spec."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from audit_plans import global_windows
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.range(100).select("id", (F.col("id") % 5).alias("k"))
    flagged = [
        W.partitionBy(F.lit(0)).orderBy("id"),  # constant partition
        W.orderBy("id"),  # no partition at all
    ]
    for w in flagged:
        plan = _formatted(df.withColumn("rn", F.row_number().over(w)))
        assert global_windows(plan), plan[:1500]
    clean = [
        W.partitionBy("k").orderBy("id"),  # keyed + ordered
        W.partitionBy("k"),  # keyed, unordered frame (2-group print)
    ]
    for w in clean:
        expr = F.row_number().over(w) if w is clean[0] else F.max("id").over(w)
        plan = _formatted(df.withColumn("x", expr))
        assert global_windows(plan) == [], plan[:1500]


def test_headline_scan_filters_are_pushed(spark):
    """Selective headline queries must show non-empty PushedFilters —
    a scan reading everything under a filter is the 100 TB failure."""
    for name in ("q01_pricing_summary", "q02_filter_project", "q03_shipping_priority",
                 "q05_region_revenue", "q06_forecast_revenue"):
        plan = _formatted(plans.QUERIES[name](spark, "/root/testdata/sf0.001"))
        assert any(
            "PushedFilters" in l and "[]" not in l for l in plan.splitlines()
        ), f"{name}: no pushed filters\n{plan[:2000]}"


def test_dynamic_partition_pruning_on_lake_fact(spark, tmp_path):
    """A hive-partitioned lake fact joined to a FILTERED dim must plan
    a dynamicpruning subquery on the partition column — at 100 TB this
    is the difference between scanning one day and scanning the table.
    (Static pruning can't help: the partition predicate only exists
    through the join.)"""
    from pyspark.sql import functions as F

    from tp_integ_data_pipeline_spark.sources.lake import DataLake

    lake = DataLake(spark, str(tmp_path / "lake"))
    fact = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).cast("string").alias("day"),
        (F.col("id") * 2).alias("v"),
    )
    lake.write_incremental("fact", fact, partition_cols=["day"], dedup_keys=["k", "day"])
    dim = spark.range(20).select(
        F.col("id").cast("string").alias("day"),
        F.when(F.col("id") < 2, "keep").otherwise("drop").alias("cls"),
    )
    stored = lake.read("fact")
    joined = stored.join(dim.filter(F.col("cls") == "keep"), "day").agg(
        F.sum("v").alias("tv")
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the answer is right: days 0 and 1 -> ids with id%20 in (0,1)
    expect = sum(i * 2 for i in range(2000) if i % 20 in (0, 1))
    assert joined.first()["tv"] == expect
