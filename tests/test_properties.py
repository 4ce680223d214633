"""Hypothesis property tests (SURVEY.md §5 #3): F8 totality over
[-720, 720] against an independent Python model of the reference
mapping, and merge idempotency under random stages."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tp_integ_data_pipeline_spark.functions.reference import wind_cardinal
from tp_integ_data_pipeline_spark.operators.merge import insert_if_absent


def reference_cardinal(g: float) -> str:
    """Python model of /root/reference/transf.py:55-78 (verified
    truth table, SURVEY.md §2.6 F8)."""
    if g == 0 or g == 360:
        return "N"
    if 0 < g < 90:
        return "NO"
    if g == 90:
        return "W"
    if 90 < g < 180:
        return "SE"
    if g == 180:
        return "S"
    if 180 < g < 270:
        return "SO"
    if g == 270:
        return "E"
    return "NE"


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-720, max_value=720), min_size=1, max_size=300))
def test_wind_cardinal_total_property(spark, degrees):
    df = spark.createDataFrame([(float(d),) for d in degrees], ["deg"])
    got = df.select("deg", wind_cardinal("deg").alias("c")).collect()
    for row in got:
        assert row.c == reference_cardinal(row.deg), row.deg


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 5)), min_size=1, max_size=40),
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 5)), min_size=1, max_size=40),
)
def test_insert_if_absent_idempotent_property(spark, target_rows, stage_rows):
    # de-dup keys within each side (tables have unique keys by contract)
    target = spark.createDataFrame(list({k: v for k, v in target_rows}.items()), ["k", "v"])
    stage = spark.createDataFrame(list({k: v for k, v in stage_rows}.items()), ["k", "v"])
    once = insert_if_absent(target, stage, ["k"])
    twice = insert_if_absent(once, stage, ["k"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    # target rows always win over stage rows with the same key
    tmap = dict(map(tuple, target.collect()))
    for k, v in a:
        if k in tmap:
            assert v == tmap[k]
