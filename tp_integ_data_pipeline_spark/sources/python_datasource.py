"""Custom Python DataSource (Spark 4 API) for API-style ingestion.

SURVEY.md §2.1 S3 notes the scale path for the reference's driver-side
HTTP fetch loop: "a custom Python DataSource". This is that source:
each configured location becomes an input partition, so N locations
fetch in parallel ON THE EXECUTORS — the distributed form of the
reference's one-location polling loop (main.py:168-199).

Usage:
    spark.dataSource.register(WeatherApiDataSource)
    df = (spark.read.format("weather_api")
          .option("locations", '[{"id":1,"url":"file:///fix1.json"}, ...]')
          .load())

URLs are fetched with urllib (supports file:// for tests/offline and
http(s):// in production). A streaming variant would implement
SimpleDataSourceStreamReader with per-poll offsets; batch + the
Structured Streaming file/rate paths (streaming/ingest.py) cover the
reference's cadence semantics, so it is intentionally omitted here.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WEATHER_DDL = (
    "api_loc_id bigint, time string, `interval` bigint, temperature_2m double, "
    "relativehumidity_2m double, apparent_temperature double, is_day bigint, "
    "precipitation double, rain double, pressure_msl double, windspeed_10m double, "
    "winddirection_10m double, windgusts_10m double"
)

_FIELDS = [
    "time",
    "interval",
    "temperature_2m",
    "relativehumidity_2m",
    "apparent_temperature",
    "is_day",
    "precipitation",
    "rain",
    "pressure_msl",
    "windspeed_10m",
    "winddirection_10m",
    "windgusts_10m",
]


class _LocationPartition(InputPartition):
    def __init__(self, loc_id: int, url: str):
        self.loc_id = loc_id
        self.url = url


class _WeatherReader(DataSourceReader):
    def __init__(self, options):
        self.locations = json.loads(options.get("locations", "[]"))

    def partitions(self):
        return [_LocationPartition(loc["id"], loc["url"]) for loc in self.locations]

    def read(self, partition: _LocationPartition):
        # Executor-side fetch: one API call per partition.
        from urllib.request import urlopen

        with urlopen(partition.url) as resp:  # noqa: S310 — caller controls URLs
            payload = json.loads(resp.read().decode("utf-8"))
        if "error" in payload:  # F13 error sniff (main.py:185-186)
            raise ValueError(f"API error: {payload.get('reason')}")
        current = payload["current"]
        yield tuple([partition.loc_id] + [current.get(f) for f in _FIELDS])


class WeatherApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> str:
        return WEATHER_DDL

    def reader(self, schema) -> _WeatherReader:
        return _WeatherReader(self.options)
