"""Pseudonymization (operators/privacy.py): referential integrity
across differently-named columns, role separation, salt rotation
unlinking, null passthrough."""

from __future__ import annotations

from tp_integ_data_pipeline_spark.operators.privacy import pseudonymize


def test_same_role_links_across_tables(spark):
    a = spark.createDataFrame([(1,), (2,), (None,)], "user_id long")
    b = spark.createDataFrame([(1,), (3,)], "c_custkey long")
    pa = pseudonymize(a, {"user_id": "person"}, salt="s").toPandas()
    pb = pseudonymize(b, {"c_custkey": "person"}, salt="s").toPandas()
    assert set(pa["user_id"].dropna()) & set(pb["c_custkey"]) != set()
    # value 1 maps identically despite different column names
    assert pa["user_id"][0] == pb["c_custkey"][0]
    # null stays null
    assert pa["user_id"][2] is None


def test_roles_and_salts_separate(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    same_role = pseudonymize(df, {"x": "r", "y": "r"}, salt="s").collect()[0]
    assert same_role["x"] == same_role["y"]
    diff_role = pseudonymize(df, ["x", "y"], salt="s").collect()[0]
    assert diff_role["x"] != diff_role["y"]
    rotated = pseudonymize(df, {"x": "r", "y": "r"}, salt="s2").collect()[0]
    assert rotated["x"] != same_role["x"]  # rotation unlinks history


def test_full_length_and_determinism(spark):
    df = spark.createDataFrame([(42,)], "k long")
    full = pseudonymize(df, ["k"], salt="s", length=None).collect()[0]["k"]
    assert len(full) == 64 and full == full.lower()
    again = pseudonymize(df, ["k"], salt="s", length=None).collect()[0]["k"]
    assert full == again
    short = pseudonymize(df, ["k"], salt="s").collect()[0]["k"]
    assert short == full[:16]
