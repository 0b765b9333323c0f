"""Explicit schemas (SURVEY.md §1) — no reader ever infers.

The reference declares schemas three ways (SQL DDL, constant JSON shape,
dbt contract — SURVEY.md §1.4); here they are importable ``StructType``s.
Reference provenance in each docstring is ``file:line`` into
``/root/reference/``.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Raw Open-Meteo payload — struct of scalars + columnar ``hourly`` block of
#: parallel arrays. Shape per ``airflow/dags/etl_openmeteo.py:76-86`` and
#: ``ingestion/extractor/run_once.py:39-49``.
RAW_OPENMETEO_SCHEMA = T.StructType(
    [
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("timezone", T.StringType()),
        T.StructField(
            "hourly",
            T.StructType(
                [
                    T.StructField("time", T.ArrayType(T.StringType())),
                    T.StructField("temperature_2m", T.ArrayType(T.DoubleType())),
                    T.StructField("precipitation", T.ArrayType(T.DoubleType())),
                    T.StructField("wind_speed_10m", T.ArrayType(T.DoubleType())),
                ]
            ),
        ),
    ]
)

#: Silver table — ``staging.weather_hourly`` per
#: ``ingestion/loader/sql/create_staging.sql:3-11``. Logical PK
#: ``(city, timestamp)`` enforced by last-write-wins merge on ``_ingested_at``
#: (``ingestion/loader/load_to_postgres.py:96-102``).
WEATHER_HOURLY_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("temperature_2m", T.DoubleType()),
        T.StructField("precipitation", T.DoubleType()),
        T.StructField("wind_speed_10m", T.DoubleType()),
        T.StructField("_ingested_at", T.TimestampType(), False),
    ]
)

#: Incremental-processing log — ``staging._ingest_log`` per
#: ``ingestion/loader/load_to_postgres.py:152-162``.
INGEST_LOG_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("etag", T.StringType()),
        T.StructField("rows_inserted", T.IntegerType()),
        T.StructField("ingested_at", T.TimestampType(), False),
    ]
)

#: Flattened validation record — the shape the GE suite sees, one row per
#: hourly point (``ge/validate_raw_weather.py:82-93``). All nullable.
VALIDATION_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("s3_uri", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("timezone", T.StringType()),
        T.StructField("time", T.StringType()),
        T.StructField("temperature_2m", T.DoubleType()),
        T.StructField("precipitation", T.DoubleType()),
        T.StructField("wind_speed_10m", T.DoubleType()),
    ]
)

#: Gold table — ``fct_city_day`` per ``dbt/models/marts/fct_city_day.sql:2-10``
#: (three AVGs; the docs' extended variant is ``fct_city_day_full``, SURVEY §8 D3).
FCT_CITY_DAY_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType(), False),
        T.StructField("day", T.TimestampType(), False),
        T.StructField("temperature_2m", T.DoubleType()),
        T.StructField("precipitation", T.DoubleType()),
        T.StructField("wind_speed_10m", T.DoubleType()),
    ]
)

#: City dimension per ``airflow/dags/etl_openmeteo.py:30-35`` — broadcast-join
#: sized (4 rows in the reference; always tiny relative to facts).
CITY_DIM_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType(), False),
        T.StructField("latitude", T.DoubleType(), False),
        T.StructField("longitude", T.DoubleType(), False),
    ]
)

CITY_COORDS: dict[str, tuple[float, float]] = {
    "Warsaw": (52.23, 21.01),
    "Berlin": (52.52, 13.41),
    "Paris": (48.86, 2.35),
    "London": (51.51, -0.13),
}
