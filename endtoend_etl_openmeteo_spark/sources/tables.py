"""Synthetic star-schema table readers (TESTDATA.md).

Parquet carries its own schema, so no inference happens; readers stay fully
declarative so Catalyst can push filters and prune columns into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to always broadcast in a join.
BROADCAST_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table at the given scale-factor directory.

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects; we read it as a long (`nanosAsLong`) and convert to a proper
    TimestampType via exact integer division (ns epoch values exceed
    double's 2^53 exact-integer range, so `div 1000`, never `/ 1000.0`).
    Truncation toward zero matches DuckDB's ns→µs narrowing.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
