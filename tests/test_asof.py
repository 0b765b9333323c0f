"""as-of join semantics (operators/asof.py)."""

import datetime as dt

from endtoend_etl_openmeteo_spark.operators.asof import asof_join


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_asof_join_semantics(spark):
    purchases = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(12), 101), (2, _ts(9), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    clicks = spark.createDataFrame(
        [
            (1, _ts(9, 30), 7),   # precedes purchase 100 and 101
            (1, _ts(11, 0), 8),   # supersedes for purchase 101
            (1, _ts(12, 0), 9),   # ties purchase 101's instant -> inclusive
            (1, _ts(13, 0), 10),  # after everything: never matched
            # user 2 has no clicks at all
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = {
        r.event_id: r.asof_event_id
        for r in asof_join(
            purchases, clicks, ["user_id"], "ts", "ts", ["event_id"], tiebreak="event_id"
        ).collect()
    }
    assert out == {100: 7, 101: 9, 102: None}


def test_asof_join_tie_on_same_instant_takes_highest_tiebreak(spark):
    purchases = spark.createDataFrame(
        [(1, _ts(10), 100)], "user_id long, ts timestamp, event_id long"
    )
    clicks = spark.createDataFrame(
        [(1, _ts(10), 5), (1, _ts(10), 6)],
        "user_id long, ts timestamp, event_id long",
    )
    out = asof_join(
        purchases, clicks, ["user_id"], "ts", "ts", ["event_id"], tiebreak="event_id"
    ).collect()
    assert out[0].asof_event_id == 6


def test_asof_forward_picks_earliest_following(spark):
    purchases = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(12), 101), (2, _ts(9), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    clicks = spark.createDataFrame(
        [
            (1, _ts(9, 30), 7),   # before everything: never matched forward
            (1, _ts(11, 0), 8),   # earliest follower of purchase 100
            (1, _ts(12, 0), 9),   # ties purchase 101's instant -> inclusive
            (1, _ts(13, 0), 10),
            # user 2 has no clicks at all
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = {
        r.event_id: r.asof_event_id
        for r in asof_join(
            purchases, clicks, ["user_id"], "ts", "ts", ["event_id"],
            tiebreak="event_id", direction="forward",
        ).collect()
    }
    assert out == {100: 8, 101: 9, 102: None}


def test_asof_rejects_unknown_direction(spark):
    import pytest as _pytest

    df = spark.range(1).selectExpr(
        "id AS user_id", "timestamp'2024-01-01' AS ts", "id AS event_id"
    )
    with _pytest.raises(ValueError, match="backward|forward"):
        asof_join(df, df, ["user_id"], "ts", "ts", ["event_id"], direction="nearest")


def test_asof_null_carry_field_not_stitched_from_older_row(spark):
    """A genuinely-null field in the nearest right row must surface as
    null — per-column carry would see THROUGH it to an older row,
    returning a (a from R2, b from R1) combination that never existed."""
    from endtoend_etl_openmeteo_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2026-01-01 12:30:00")], "key string, ts string"
    ).selectExpr("key", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [
            ("k", "2026-01-01 11:00:00", 3.0, 7.0),
            ("k", "2026-01-01 12:00:00", 5.0, None),
        ],
        "key string, ts string, a double, b double",
    ).selectExpr("key", "cast(ts as timestamp) ts", "a", "b")
    out = asof_join(left, right, ["key"], "ts", "ts", ["a", "b"]).collect()
    assert len(out) == 1
    assert out[0]["asof_a"] == 5.0
    assert out[0]["asof_b"] is None  # the nearest ROW's value, not R1's 7.0
