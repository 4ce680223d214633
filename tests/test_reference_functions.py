"""Golden tests for the reference scalar semantics (SURVEY.md §2.6).

The F8 wind-cardinal table is the verified truth table from executing
the reference's a_cardinales (transf.py:55-78) — the non-standard
mapping is the contract, locked here so nobody "fixes" it.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.functions.reference import (
    date_ddmmyyyy,
    format_postcodes,
    hpa_to_mmhg,
    int_to_bool,
    none_to_null,
    partition_date,
    shift_gmt3,
    time_hhmm,
    wind_cardinal,
)

# (degrees, expected) — boundaries, open intervals, negatives, >360
F8_TRUTH_TABLE = [
    (0, "N"),
    (360, "N"),
    (45, "NO"),
    (89.9, "NO"),
    (90, "W"),
    (91, "SE"),
    (135, "SE"),
    (180, "S"),
    (181, "SO"),
    (269, "SO"),
    (270, "E"),
    (271, "NE"),
    (359, "NE"),
    (361, "NE"),
    (720, "NE"),
    (-1, "NE"),
    (-90, "NE"),
]


def test_wind_cardinal_truth_table(spark):
    df = spark.createDataFrame([(float(d),) for d, _ in F8_TRUTH_TABLE], ["deg"])
    got = df.select("deg", wind_cardinal("deg").alias("card")).collect()
    expected = {float(d): c for d, c in F8_TRUTH_TABLE}
    for row in got:
        assert row.card == expected[row.deg], f"{row.deg}: {row.card}"


def test_timestamp_chain(spark):
    df = spark.createDataFrame([("2023-07-15T14:30:00",)], ["iso"])
    out = df.select(
        F.to_timestamp("iso").alias("ts"),
    ).select(
        partition_date("ts").alias("partic"),
        date_ddmmyyyy(shift_gmt3("ts")).alias("d"),
        time_hhmm(shift_gmt3("ts")).alias("t"),
    ).first()
    assert out.partic == "07-15-23"
    assert out.d == "15/07/2023"
    assert out.t == "11:30"  # −3h fixed shift


def test_unit_and_bool(spark):
    df = spark.createDataFrame([(1013.25, 1), (990.0, 0)], ["p", "d"])
    rows = df.select(
        hpa_to_mmhg("p").alias("mmhg"), int_to_bool("d").alias("b")
    ).collect()
    assert abs(rows[0].mmhg - 1013.25 * 0.750064) < 1e-9
    assert rows[0].b is True and rows[1].b is False


def test_postcodes_and_none_null(spark):
    df = spark.createDataFrame(
        [Row(pc=["1900", "1902"], a="None"), Row(pc=["5000"], a="Cordoba"), Row(pc=None, a=None)]
    )
    rows = df.select(
        format_postcodes("pc").alias("pcs"), none_to_null("a").alias("a")
    ).collect()
    assert rows[0].pcs == "1900, 1902" and rows[0].a is None
    assert rows[1].pcs == "5000" and rows[1].a == "Cordoba"
    assert rows[2].a is None
