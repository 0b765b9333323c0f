"""Events-table timestamp-encoding robustness.

The driver has regenerated ``events.parquet`` with a different physical
timestamp encoding twice (TIMESTAMP(NANOS) in round 1, µs TIMESTAMP_NTZ in
round 3), each time breaking every ``unix_micros(ts)`` call site. These tests
write the same fixture rows in all three encodings and pin that:

- ``tbl()`` normalizes ``ts`` to TimestampType with identical instants, and
- ``events_between`` keeps its predicate on the RAW column so it still pushes
  into the parquet scan (no silent full scan at 100 TB).
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from endtoend_etl_openmeteo_spark.sources.tables import events_between, tbl

UTC = dt.timezone.utc
ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=UTC), 10, "view", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 5, 12, 30, 0, tzinfo=UTC), 10, "click", 2.5, "{}"),
    (3, dt.datetime(2024, 1, 9, 23, 59, 59, tzinfo=UTC), 11, "view", 3.5, "{}"),
    (4, dt.datetime(2024, 1, 15, 6, 0, 0, tzinfo=UTC), 11, "buy", 4.5, "{}"),
]
ENCODINGS = ("nanos", "us_ntz", "us_ltz")


def _write_events(path: str, encoding: str) -> None:
    if encoding == "nanos":
        ts_type = pa.timestamp("ns")  # legacy TIMESTAMP(NANOS): Spark reads as long
        ts_vals = [int(r[1].timestamp() * 1_000_000) * 1_000 for r in ROWS]
    elif encoding == "us_ntz":
        ts_type = pa.timestamp("us")  # isAdjustedToUTC=false → TIMESTAMP_NTZ
        ts_vals = [r[1].replace(tzinfo=None) for r in ROWS]
    else:
        ts_type = pa.timestamp("us", tz="UTC")  # TIMESTAMP_LTZ
        ts_vals = [r[1] for r in ROWS]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array(ts_vals, ts_type),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    dirs = {}
    for enc in ENCODINGS:
        d = tmp_path_factory.mktemp(f"events_{enc}")
        _write_events(str(d / "events.parquet"), enc)
        dirs[enc] = str(d)
    return dirs


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_tbl_normalizes_ts_to_timestamp_ltz(spark, encoded_dirs, encoding):
    df = tbl(spark, encoded_dirs[encoding], "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp", encoding
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    want = [r[1].replace(tzinfo=None) for r in ROWS]  # driver returns naive local(UTC)
    assert got == want, encoding


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_unix_micros_works_on_every_encoding(spark, encoded_dirs, encoding):
    from pyspark.sql import functions as F

    df = tbl(spark, encoded_dirs[encoding], "events")
    micros = [r[0] for r in df.orderBy("event_id").select(F.unix_micros("ts")).collect()]
    want = [int(r[1].timestamp() * 1_000_000) for r in ROWS]
    assert micros == want, encoding


def test_orders_nanos_encoding_repaired(spark, tmp_path):
    """orders/lineitem timestamp columns repair NANOS-as-long too (the r1
    failure mode) — other encodings pass through untouched."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=UTC)
    table = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([7, 8], pa.int64()),
            "o_orderstatus": pa.array(["O", "F"], pa.string()),
            "o_totalprice": pa.array([10.0, 20.0], pa.float64()),
            "o_orderdate": pa.array(
                [int(base.timestamp() * 1e6) * 1_000] * 2, pa.timestamp("ns")
            ),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "orders.parquet"))
    df = tbl(spark, str(tmp_path), "orders")
    assert df.schema["o_orderdate"].dataType.typeName() == "timestamp"
    assert [r["o_orderdate"] for r in df.collect()] == [base.replace(tzinfo=None)] * 2


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_events_between_filters_and_pushes_down(spark, encoded_dirs, encoding):
    df = events_between(
        spark, encoded_dirs[encoding], "2024-01-05T00:00:00", "2024-01-10T00:00:00"
    )
    assert df.schema["ts"].dataType.typeName() == "timestamp", encoding
    assert sorted(r["event_id"] for r in df.collect()) == [2, 3], encoding
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The range predicate must sit on the raw scan column, visible to the
    # parquet reader (row-group stats), not on a derived/cast column.
    scan = plan.split("FileScan")[1]
    data_filters = scan.split("DataFilters: [")[1].split("]")[0]
    assert "ts" in data_filters and (">=" in data_filters or "GreaterThanOrEqual" in data_filters), (
        encoding,
        data_filters,
    )


def test_events_between_offset_and_fractional_bounds_consistent(spark, encoded_dirs):
    """Bound-string parsing is ONE convention across all three physical
    encodings: explicit UTC offsets are honored and fractional seconds
    survive at µs precision. The NANOS path previously reinterpreted an
    offset-bearing bound as UTC wall clock (a shifted window) and
    truncated fractions — same call, different rows per encoding."""
    # 14:30+02:00 == 12:30Z (event 2's exact instant, >= includes it);
    # 07:00+01:00 == 06:00Z (event 4's instant, < excludes it)
    for enc in ENCODINGS:
        got = sorted(
            r["event_id"]
            for r in events_between(
                spark,
                encoded_dirs[enc],
                "2024-01-05T14:30:00+02:00",
                "2024-01-15T07:00:00+01:00",
            ).collect()
        )
        assert got == [2, 3], enc
    # a 1µs-past-the-instant fractional start excludes event 2 everywhere
    for enc in ENCODINGS:
        got = sorted(
            r["event_id"]
            for r in events_between(
                spark,
                encoded_dirs[enc],
                "2024-01-05T12:30:00.000001",
                "2024-01-16T00:00:00",
            ).collect()
        )
        assert got == [3, 4], enc


def test_nanos_latch_restored_when_retry_also_fails(spark, tmp_path):
    """_read_parquet_nanos_safe must not leave the session-wide
    nanosAsLong latch set when the retried read fails too (the failure
    wasn't a nanos issue) — otherwise every later parquet read outside
    the tbl() wrapper silently decodes TIMESTAMP(NANOS) columns as
    long."""
    import pytest

    from endtoend_etl_openmeteo_spark.sources.tables import (
        _read_parquet_nanos_safe,
    )

    conf = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(conf, "false")
    spark.conf.set(conf, "false")
    try:
        with pytest.raises(Exception):
            _read_parquet_nanos_safe(spark, str(tmp_path / "missing.parquet"))
        assert spark.conf.get(conf, "false") == "false"
    finally:
        spark.conf.set(conf, before)
