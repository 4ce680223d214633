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


def test_q06_all_predicates_pushed(spark):
    plan = _formatted(plans.QUERIES["q06_forecast_revenue"](spark, "/root/testdata/sf0.001"))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, pushed
