"""JDBC relational source/sink (SURVEY.md §2.1 S11).

The reference reads its staging table back out of Postgres for gap
detection (``airflow/dags/backfill_openmeteo.py:30-63`` in
``/root/reference/``) and upserts into it over psycopg2. The Spark
equivalents are ``spark.read.jdbc`` with partitioned reads and a batched
``DataFrameWriter.jdbc`` append; exercised end-to-end against embedded
Derby (which ships in Spark's jars — tests/test_jdbc.py). Against a URL
with no driver jar or reachable database the functions raise a clear
ConnectionError instead of a Py4J stack.

Scale notes baked into the defaults:
- reads MUST be partitioned (`partition_col` + bounds) or the whole table
  arrives through one executor connection;
- writes batch (`batchsize`) — the reference's execute_values insight
  ("one roundtrip", load_to_postgres.py:89) applied per partition;
- upsert semantics on a JDBC sink need the merge to happen Spark-side
  first (operators.merge.dedup_last_write_wins) with the sink in append
  mode to a staging table, or a foreachPartition upsert — plain JDBC
  overwrite drops the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_col: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC table read; unpartitioned reads are refused for
    anything but explicitly acknowledged small dims (pass
    ``allow_single_partition='true'``)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    # Pop unconditionally: passed alongside partition_col it must not leak
    # through as a JDBC reader option / driver connection property.
    allow_single = options.pop("allow_single_partition", "false")
    if partition_col is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_col)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    elif allow_single != "true":
        raise ValueError(
            "unpartitioned JDBC read pulls the whole table through one "
            "connection; pass partition_col+bounds, or "
            "allow_single_partition='true' for a small dimension table"
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - no JDBC driver in this env
        # carry the real cause in the message: a missing table, SQL error,
        # or auth failure against a reachable database is NOT a
        # connectivity problem, and hiding it behind "driver jar?" sends
        # the operator debugging the wrong layer
        raise ConnectionError(
            f"JDBC read failed for {table!r} at {url}: "
            f"{type(e).__name__}: {e} (if the driver jar or database is "
            "missing this is connectivity; otherwise fix the query/table)"
        ) from e


def write_jdbc_append(
    df: DataFrame, url: str, table: str, batchsize: int = 10_000, **options: str
) -> None:
    """Batched append to a JDBC table (the set-based write of
    load_to_postgres.py:89-102). For upserts, dedup Spark-side first and
    land in a staging table the database merges from."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as e:  # pragma: no cover - no JDBC driver in this env
        raise ConnectionError(
            f"JDBC write failed for {table!r} at {url}: "
            f"{type(e).__name__}: {e} (if the driver jar or database is "
            "missing this is connectivity; otherwise fix the schema/table)"
        ) from e
