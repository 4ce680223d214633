"""Custom Python DataSource test: parallel per-location ingestion."""

from __future__ import annotations

import json

from tp_integ_data_pipeline_spark.sources.python_datasource import WeatherApiDataSource


def test_weather_api_datasource(spark, tmp_path):
    payloads = []
    for i, temp in [(1, 20.5), (2, 11.0), (3, 30.25)]:
        p = tmp_path / f"loc{i}.json"
        p.write_text(
            json.dumps(
                {
                    "current": {
                        "time": f"2023-07-1{i}T10:00",
                        "interval": 900,
                        "temperature_2m": temp,
                        "relativehumidity_2m": 50.0,
                        "apparent_temperature": temp - 1,
                        "is_day": 1,
                        "precipitation": 0.0,
                        "rain": 0.0,
                        "pressure_msl": 1010.0,
                        "windspeed_10m": 5.0,
                        "winddirection_10m": 180.0,
                        "windgusts_10m": 9.0,
                    }
                }
            )
        )
        payloads.append({"id": i, "url": f"file://{p}"})

    spark.dataSource.register(WeatherApiDataSource)
    df = (
        spark.read.format("weather_api")
        .option("locations", json.dumps(payloads))
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one fetch partition per location
    rows = {r.api_loc_id: r for r in df.collect()}
    assert rows[1].temperature_2m == 20.5 and rows[3].temperature_2m == 30.25
    assert rows[2].time == "2023-07-12T10:00"
