"""Point-in-interval join: boundary semantics + plan shape."""

import datetime as dt

import pytest
from pyspark.sql import Row

from endtoend_etl_openmeteo_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            Row(pid=1, ts=_ts("2024-01-01 10:00:00")),  # == start: included
            Row(pid=2, ts=_ts("2024-01-01 13:59:59")),  # inside
            Row(pid=3, ts=_ts("2024-01-01 14:00:00")),  # == end: excluded
            Row(pid=4, ts=_ts("2024-01-02 01:00:00")),  # next-day spillover
            Row(pid=5, ts=_ts("2024-01-05 00:00:00")),  # matches nothing
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid=10, start=_ts("2024-01-01 10:00:00"), end=_ts("2024-01-01 14:00:00")),
            # crosses a day boundary — must still catch pid=4 with day chunks
            Row(iid=20, start=_ts("2024-01-01 23:00:00"), end=_ts("2024-01-02 02:00:00")),
        ]
    )
    return points, intervals


@pytest.mark.parametrize("chunk", ["hour", "day", "week"])
def test_half_open_bounds_any_chunk_size(spark, frames, chunk):
    points, intervals = frames
    got = {
        (r.pid, r.iid)
        for r in interval_join(points, intervals, "ts", "start", "end", chunk=chunk).collect()
    }
    assert got == {(1, 10), (2, 10), (4, 20)}


def test_no_nested_loop_in_plan(spark, frames):
    points, intervals = frames
    plan = (
        interval_join(points, intervals, "ts", "start", "end")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bad_chunk_rejected(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="chunk must be one of"):
        interval_join(points, intervals, "ts", "start", "end", chunk="minute")


def test_inverted_interval_matches_nothing_instead_of_crashing(spark):
    """One malformed end<start row must not fail the whole join."""
    from endtoend_etl_openmeteo_spark.operators.rangejoin import interval_join

    pts = spark.createDataFrame(
        [(1, "2026-01-04 00:00:00")], "id long, ts string"
    ).selectExpr("id", "cast(ts as timestamp) ts")
    iv = spark.createDataFrame(
        [
            ("good", "2026-01-03 00:00:00", "2026-01-05 00:00:00"),
            ("bad", "2026-01-05 00:00:00", "2026-01-03 00:00:00"),
        ],
        "name string, s string, e string",
    ).selectExpr("name", "cast(s as timestamp) s", "cast(e as timestamp) e")
    out = interval_join(pts, iv, "ts", "s", "e", chunk="day").collect()
    assert [r.name for r in out] == ["good"]
