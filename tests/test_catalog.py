"""Catalog/DDL layer tests (S10-S14)."""

from __future__ import annotations

import pytest

from tp_integ_data_pipeline_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def catalog(spark):
    return Catalog(spark, database="orion_test")


def test_create_insert_truncate_roundtrip(spark, catalog):
    catalog.create_table("meteor_stg", {"date": "STRING", "time": "STRING", "temp": "DOUBLE"})
    df = spark.createDataFrame([("15/07/2023", "10:00", 20.5)], ["date", "time", "temp"])
    catalog.insert_append("meteor_stg", df)
    assert catalog.sql("SELECT COUNT(*) AS n FROM orion_test.meteor_stg").first().n == 1
    catalog.truncate("meteor_stg")  # S12
    assert catalog.sql("SELECT COUNT(*) AS n FROM orion_test.meteor_stg").first().n == 0
    catalog.insert_append("meteor_stg", df)
    assert catalog.show_table("meteor_stg").count() == 1


def test_database_idempotent(spark):
    # S10: re-instantiation must not fail (CREATE DATABASE IF NOT EXISTS)
    Catalog(spark, database="orion_test")
    Catalog(spark, database="orion_test")
    assert spark.catalog.databaseExists("orion_test")


def test_analyze_table_collects_stats(spark, catalog):
    from tp_integ_data_pipeline_spark.sources.catalog import analyze_table

    catalog.create_table("stats_t", {"k": "BIGINT", "v": "DOUBLE"})
    catalog.insert_append(
        "stats_t", spark.createDataFrame([(i, float(i)) for i in range(50)], ["k", "v"])
    )
    analyze_table(spark, "orion_test.stats_t", columns=["k"])
    desc = {r.col_name: r.data_type for r in spark.sql(
        "DESCRIBE TABLE EXTENDED orion_test.stats_t"
    ).collect()}
    assert "Statistics" in desc  # rowCount/sizeInBytes recorded
