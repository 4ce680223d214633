"""Inline observability: metrics come from the SAME action (no second
scan), audited_write round-trip, misuse guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.observe import audited_write, with_audit


def test_audited_write_metrics_match_data(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10.0, None), (2, 20.0, "x"), (3, None, "y")], "k long, v double, s string"
    )
    m = audited_write(
        df,
        str(tmp_path / "out"),
        {
            "n": F.count(F.lit(1)),
            "v_nulls": F.count(F.when(F.col("v").isNull(), 1)),
            "k_max": F.max("k"),
        },
    )
    assert (m["n"], m["v_nulls"], m["k_max"]) == (3, 1, 3)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 3  # the write really happened


def test_with_audit_single_pass_and_plan_free_of_second_scan(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    observed, obs = with_audit(df, {"n": F.count(F.lit(1)), "vsum": F.sum("v")})
    # metrics appear after ONE action on the observed frame
    assert observed.count() == 100
    got = dict(obs.get)
    assert got == {"n": 100, "vsum": 9900}
    # the observed plan is the same single scan + CollectMetrics: no
    # extra exchange/aggregate subtree for the metrics
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan


def test_with_audit_rejects_empty_metrics(spark):
    with pytest.raises(ValueError):
        with_audit(spark.range(1), {})
