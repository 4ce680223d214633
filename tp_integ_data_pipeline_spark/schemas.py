"""Schema registry (SURVEY.md §1.2/§1.3) — explicit StructTypes for
the reference's inferred-then-aligned frames.

The reference aligns every geocoding response to a fixed 20-column
schema `max_campos` (main.py:242-245), filling absent JSON fields with
NaN (main.py:251-253), force-casting admin*/admin*_id to string
(main.py:256-260) and reordering (main.py:263). With explicit schemas
+ from_json, absent fields become typed nulls natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A1 weather record: the flattened Open-Meteo "current" object plus
# ingest-added columns (main.py:201-217; transf.py:286-305).
WEATHER_RAW = T.StructType(
    [
        T.StructField("time", T.StringType()),  # ISO string at ingest; F1 → timestamp
        T.StructField("interval", T.LongType()),
        T.StructField("temperature_2m", T.DoubleType()),
        T.StructField("relativehumidity_2m", T.DoubleType()),
        T.StructField("apparent_temperature", T.DoubleType()),
        T.StructField("is_day", T.LongType()),
        T.StructField("precipitation", T.DoubleType()),
        T.StructField("rain", T.DoubleType()),
        T.StructField("pressure_msl", T.DoubleType()),
        T.StructField("windspeed_10m", T.DoubleType()),
        T.StructField("winddirection_10m", T.DoubleType()),
        T.StructField("windgusts_10m", T.DoubleType()),
    ]
)

#: The fixed 20-column geocoding schema (max_campos, main.py:242-245).
LOCALITIES = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("elevation", T.DoubleType()),
        T.StructField("feature_code", T.StringType()),
        T.StructField("country_code", T.StringType()),
        T.StructField("admin1_id", T.StringType()),
        T.StructField("admin2_id", T.StringType()),
        T.StructField("admin3_id", T.StringType()),
        T.StructField("admin4_id", T.StringType()),
        T.StructField("timezone", T.StringType()),
        T.StructField("population", T.DoubleType()),
        T.StructField("postcodes", T.ArrayType(T.StringType())),
        T.StructField("country_id", T.LongType()),
        T.StructField("country", T.StringType()),
        T.StructField("admin1", T.StringType()),
        T.StructField("admin2", T.StringType()),
        T.StructField("admin3", T.StringType()),
        T.StructField("admin4", T.StringType()),
    ]
)


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """P5/P3/P6 composed: add absent columns as typed nulls, cast
    present ones to the declared type, project in schema order — the
    engine's form of main.py:242-263."""
    out = df
    for field in schema.fields:
        if field.name not in out.columns:
            out = out.withColumn(field.name, F.lit(None).cast(field.dataType))
        else:
            out = out.withColumn(field.name, F.col(field.name).cast(field.dataType))
    return out.select(*[f.name for f in schema.fields])
