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


def events_between(spark: SparkSession, sf_dir: str, start_iso: str, end_iso: str) -> DataFrame:
    """Half-open time-range scan of events with REAL parquet pushdown.

    ``ts`` is derived (timestamp_micros over the raw ns long), so a filter
    on it cannot reach the parquet reader — at 100 TB that's a full scan.
    This helper filters the RAW long column with ns epoch literals (pushed
    into row-group stats) and converts afterwards.
    """
    import datetime as dt

    def ns(iso: str) -> int:
        d = dt.datetime.fromisoformat(iso).replace(tzinfo=dt.timezone.utc)
        return int(d.timestamp()) * 1_000_000_000

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if not isinstance(raw.schema["ts"].dataType, T.LongType):
        return raw.filter(
            (F.col("ts") >= F.lit(start_iso).cast("timestamp"))
            & (F.col("ts") < F.lit(end_iso).cast("timestamp"))
        )
    return raw.filter(
        (F.col("ts") >= F.lit(ns(start_iso))) & (F.col("ts") < F.lit(ns(end_iso)))
    ).withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
