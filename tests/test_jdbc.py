"""JDBC source/sink round-trip against embedded Derby (SURVEY.md §2.1 S11).

Spark ships org.apache.derby in its jars, so the wrappers can be exercised
end-to-end in-process — no network, no external database. Derby's embedded
driver serves every executor thread of the local JVM, standing in for the
reference's Postgres (`ingestion/loader/load_to_postgres.py:34-42`).
"""

import uuid

import pytest
from pyspark.sql import Row

from endtoend_etl_openmeteo_spark.sources.jdbc import read_jdbc, write_jdbc_append

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url():
    # per-module in-memory DB; lives as long as the (shared) test JVM
    return f"jdbc:derby:memory:t{uuid.uuid4().hex[:8]};create=true"


@pytest.fixture(scope="module")
def loaded(spark, derby_url):
    df = spark.createDataFrame(
        [Row(id=i, city=f"city_{i % 3}", temp=10.0 + i) for i in range(20)]
    )
    write_jdbc_append(df, derby_url, "weather", batchsize=5, driver=DRIVER)
    return derby_url


def test_partitioned_read_round_trip(spark, loaded):
    back = read_jdbc(
        spark,
        loaded,
        "weather",
        partition_col="id",
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
        driver=DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    rows = {(r.id, r.city, r.temp) for r in back.collect()}
    assert rows == {(i, f"city_{i % 3}", 10.0 + i) for i in range(20)}


def test_append_is_batched_not_replaced(spark, loaded):
    extra = spark.createDataFrame([Row(id=100, city="city_x", temp=99.0)])
    write_jdbc_append(extra, loaded, "weather", driver=DRIVER)
    back = read_jdbc(spark, loaded, "weather", allow_single_partition="true", driver=DRIVER)
    assert back.count() == 21


def test_unpartitioned_read_refused_without_acknowledgement(spark, loaded):
    with pytest.raises(ValueError, match="unpartitioned JDBC read"):
        read_jdbc(spark, loaded, "weather", driver=DRIVER)


def test_allow_single_partition_never_leaks_to_driver(spark, loaded):
    # passed ALONGSIDE partition_col it must be swallowed, not forwarded as a
    # connection property (Derby rejects unknown attributes loudly)
    back = read_jdbc(
        spark,
        loaded,
        "weather",
        partition_col="id",
        lower_bound=0,
        upper_bound=20,
        num_partitions=2,
        allow_single_partition="true",
        driver=DRIVER,
    )
    assert back.count() == 21


def test_partitioned_read_requires_bounds(spark, loaded):
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        read_jdbc(spark, loaded, "weather", partition_col="id", driver=DRIVER)
