"""End-to-end reference-parity tests (SURVEY.md §3): EP1 extraction
with fixture JSON, EP2 transform+load golden checks and idempotency.
Fixture shapes follow FIXTURES.md §A1/§A2."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.plans.pipelines import (
    METEOR_PROC_COLS,
    run_extraction,
    run_transform_and_load,
    transform_localities,
    transform_weather,
)
from tp_integ_data_pipeline_spark.schemas import LOCALITIES, WEATHER_RAW, align_to_schema
from tp_integ_data_pipeline_spark.sources.http_json import parse_geocoding, parse_weather
from tp_integ_data_pipeline_spark.sources.lake import DataLake

GEO_JSON = json.dumps(
    {
        "results": [
            {
                "id": 1001,
                "name": "La Plata",
                "latitude": -34.92,
                "longitude": -57.95,
                "country_code": "AR",
                "country": "Argentina",
                "country_id": 3865483,
                "admin1": "Buenos Aires",
                "postcodes": ["1900", "1902"],
                # admin2..4, elevation, population, timezone ABSENT —
                # the geocoding API drops empty fields (main.py:242-253)
            },
            {
                "id": 1002,
                "name": "La Plata Oeste",
                "latitude": -34.93,
                "longitude": -57.99,
                "country_code": "AR",
                "country": "Argentina",
                "country_id": 3865483,
                "admin1": "None",
                "postcodes": ["1903"],
            },
        ]
    }
)

WEATHER_JSON = json.dumps(
    {
        "current": {
            "time": "2023-07-15T14:30",
            "interval": 900,
            "temperature_2m": 10.5,
            "relativehumidity_2m": 80.0,
            "apparent_temperature": 9.1,
            "is_day": 1,
            "precipitation": 0.0,
            "rain": 0.0,
            "pressure_msl": 1013.25,
            "windspeed_10m": 12.0,
            "winddirection_10m": 90.0,
            "windgusts_10m": 20.0,
        }
    }
)


def fake_fetch(url: str) -> str:
    return GEO_JSON if "geocoding" in url else WEATHER_JSON


def test_parse_geocoding_aligns_absent_fields(spark):
    geo = parse_geocoding(spark, GEO_JSON)
    assert [f.name for f in geo.schema.fields] == [f.name for f in LOCALITIES.fields]
    row = geo.filter(F.col("id") == 1001).first()
    assert row.admin2 is None and row.elevation is None and row.population is None
    assert row.postcodes == ["1900", "1902"]


def test_parse_weather_flatten_and_partition_key(spark):
    w = parse_weather(spark, WEATHER_JSON, api_loc_id=1001)
    row = w.first()
    assert row.api_loc_id == 1001
    assert row.fecha_partic == "07-15-23"
    assert str(row.time) == "2023-07-15 14:30:00"


def test_api_error_sniff(spark):
    with pytest.raises(ValueError, match="API error"):
        parse_weather(spark, json.dumps({"error": True, "reason": "bad coords"}), 1)


def test_ep1_extraction_to_lake(spark, tmp_path):
    lake = DataLake(spark, str(tmp_path))
    run_extraction(spark, fake_fetch, lake, "La Plata")
    assert lake.read("localid").count() == 2
    assert lake.read("regmeteor").count() == 1
    # re-run: same weather time + same locality ids → nothing new
    run_extraction(spark, fake_fetch, lake, "La Plata")
    assert lake.read("localid").count() == 2
    assert lake.read("regmeteor").count() == 1


def test_ep2_transform_golden_and_idempotent(spark, tmp_path):
    lake = DataLake(spark, str(tmp_path / "lake"))
    run_extraction(spark, fake_fetch, lake, "La Plata")

    out = run_transform_and_load(
        spark,
        lake,
        str(tmp_path / "wh"),
        load_date="2024-06-01",
        merge_date="2024-07-01",
    )
    meteor = out["meteor_proc"]
    assert meteor.columns == METEOR_PROC_COLS
    row = meteor.first()
    # golden values per the reference chain (transf.py:41-108):
    assert row.date == "15/07/2023" and row.time == "11:30"  # −3h shift
    assert row.winddir_cardinal_10m == "W"  # F8: exactly 90 → 'W'
    assert abs(row.pressure_msl - 1013.25 * 0.750064) < 1e-9
    assert row.is_day is True
    assert row.city == "La Plata" and row.country == "Argentina"

    locs = out["loc_proc"]
    lrows = {r.id: r for r in locs.collect()}
    assert lrows[1001].postcodes == "1900, 1902"  # F9 formatting
    assert lrows[1002].admin1 is None  # F10 'None' → null
    assert str(lrows[1001].fecha_actualizacion) == "2024-07-01"
    assert str(lrows[1001].fecha_actualizacion_origen) == "2024-06-01"

    # idempotency (README.md:86): run EP2 again → identical end state
    out2 = run_transform_and_load(
        spark, lake, str(tmp_path / "wh"), load_date="2024-06-01", merge_date="2024-07-01"
    )
    assert out2["meteor_proc"].count() == meteor.count()
    assert sorted(map(tuple, out2["loc_proc"].collect())) == sorted(map(tuple, locs.collect()))


def test_align_to_schema_casts_and_reorders(spark):
    df = spark.createDataFrame([(1, "x", "7")], ["country_id", "name", "admin1_id"])
    out = align_to_schema(df, LOCALITIES)
    assert [f.name for f in out.schema.fields] == [f.name for f in LOCALITIES.fields]
    assert dict(out.dtypes)["admin1_id"] == "string"
    assert out.first().latitude is None
