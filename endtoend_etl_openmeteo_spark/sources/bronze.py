"""Bronze layer: partitioned JSON payloads (SURVEY.md §2.1 S3/S6, §1.1).

The reference writes one JSON object per (city, hour) under Hive-style keys
``weather/{city}/ds=YYYY-MM-DD/hour=HH/...`` (``ingestion/extractor/
s3_writer.py:59-61``). In Spark that layout IS the table: partition
discovery turns the key scheme into prunable columns, so a per-city or
per-day read never lists the rest of the corpus.

The HTTP fetch itself (S1/S2) is a driver-side concern: a batch of API
payloads enters the engine as ``spark.createDataFrame`` rows or a JSON
fixture directory — the engine is deliberately source-agnostic past that
point (no HTTP inside executors; at scale ingestion parallelism comes from
many small files, which the file index handles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from endtoend_etl_openmeteo_spark.schemas import RAW_OPENMETEO_SCHEMA

#: Bronze partition columns, mirroring the reference's key scheme.
BRONZE_PARTITIONS = ("city", "ds", "hour")

#: Read schema = payload schema + partition columns appended by discovery.
BRONZE_READ_SCHEMA = T.StructType(
    RAW_OPENMETEO_SCHEMA.fields
    + [
        T.StructField("city", T.StringType()),
        T.StructField("ds", T.StringType()),
        T.StructField("hour", T.StringType()),
    ]
)


def write_bronze(payloads: DataFrame, path: str, mode: str = "append") -> None:
    """Write payload rows (schema §1.2 + city/ds/hour columns) as
    Hive-partitioned JSON — the S3 sink S3 re-expressed."""
    payloads.write.mode(mode).partitionBy(*BRONZE_PARTITIONS).json(path)


def read_bronze(spark: SparkSession, path: str) -> DataFrame:
    """Read the bronze table with the explicit payload schema (never
    inferred, SURVEY §1.4) + automatic partition discovery."""
    return spark.read.schema(BRONZE_READ_SCHEMA).json(path)
