"""Skew-resilient window operators: chunked execution must be EXACTLY the
plain window, on data crafted to cross every boundary (chunk edges, block
edges, halo spans, partial last blocks, hot keys)."""

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.skew import (
    chunked_moving_agg,
    chunked_running_sum,
    global_row_number,
)


def _events(spark):
    """Two keys: a hot key (60 rows across 3 hour-bins, including a burst
    sharing one timestamp) and a cold key (3 rows, fewer than any frame)."""
    base = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = []
    for i in range(60):
        # hot key: rows every 7 minutes -> spans several hourly chunks
        rows.append((1, i, base + dt.timedelta(minutes=7 * i), float(i % 10) + 0.5))
    for i in range(5):
        # burst: same timestamp, ordering falls to event_id
        rows.append((1, 100 + i, base + dt.timedelta(hours=9), 2.0 + i))
    for i in range(3):
        rows.append((2, 200 + i, base + dt.timedelta(hours=i), 10.0 * (i + 1)))
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def _plain(df, expr_fn):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return {
        (r.user_id, r.event_id): r.x
        for r in df.select("user_id", "event_id", expr_fn(w).alias("x")).collect()
    }


def test_global_row_number_matches_plain(spark):
    df = _events(spark)
    got = {
        (r.user_id, r.event_id): r["__grn"]
        for r in global_row_number(
            df, ["user_id"], ["ts", "event_id"], chunk_seconds=3600
        ).collect()
    }
    want = _plain(df, lambda w: F.row_number().over(w).cast("long"))
    assert got == want


def test_chunked_running_sum_matches_plain(spark):
    df = _events(spark)
    got = {
        (r.user_id, r.event_id): round(r.running_sum, 6)
        for r in chunked_running_sum(
            df, ["user_id"], ["ts", "event_id"], "value", chunk_seconds=3600
        ).collect()
    }
    want = _plain(
        df,
        lambda w: F.round(
            F.sum("value").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            6,
        ),
    )
    assert got == want


@pytest.mark.parametrize("block_rows", [8, 4096])
def test_chunked_moving_agg_matches_plain(spark, block_rows):
    # block_rows=8 forces many blocks + halo stitching on the hot key;
    # 4096 exercises the single-block path
    df = _events(spark)
    got = {
        (r.user_id, r.event_id): round(r.mov_agg, 6)
        for r in chunked_moving_agg(
            df,
            ["user_id"],
            ["ts", "event_id"],
            "value",
            frame_rows=3,
            agg="avg",
            chunk_seconds=3600,
            block_rows=block_rows,
        ).collect()
    }
    want = _plain(
        df,
        lambda w: F.round(
            F.avg("value").over(w.rowsBetween(-3, Window.currentRow)), 6
        ),
    )
    assert got == want


def test_chunked_moving_agg_min_over_tiny_blocks(spark):
    # a non-invertible aggregate (min can't be stitched from partials the
    # way sums can) — the halo construction must still be exact
    df = _events(spark)
    got = {
        (r.user_id, r.event_id): r.mov_agg
        for r in chunked_moving_agg(
            df,
            ["user_id"],
            ["ts", "event_id"],
            "value",
            frame_rows=5,
            agg="min",
            chunk_seconds=3600,
            block_rows=7,
        ).collect()
    }
    want = _plain(
        df, lambda w: F.min("value").over(w.rowsBetween(-5, Window.currentRow))
    )
    assert got == want


def test_guards(spark):
    df = _events(spark)
    with pytest.raises(ValueError, match="block_rows"):
        chunked_moving_agg(
            df, ["user_id"], ["ts", "event_id"], "value",
            frame_rows=10, block_rows=10,
        )
    with pytest.raises(ValueError, match="order_cols must start"):
        chunked_running_sum(df, ["user_id"], ["event_id", "ts"], "value")
    with pytest.raises(ValueError, match="order_cols must start"):
        global_row_number(df, ["user_id"], ["event_id"])
    with pytest.raises(ValueError, match="unsupported"):
        chunked_moving_agg(
            df, ["user_id"], ["ts", "event_id"], "value",
            frame_rows=3, agg="median",
        )


def test_hot_key_work_is_distributed(spark):
    """The scale claim: no physical window in the chunked running sum
    partitions by the bare key over the full data — every full-data window
    keys on (key, chunk). The only bare-key window runs over per-chunk
    TOTALS (#bins rows per key)."""
    df = _events(spark)
    plan = (
        chunked_running_sum(
            df, ["user_id"], ["ts", "event_id"], "value", chunk_seconds=3600
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # Per physical-plan line: `Window [exprs], [partition cols], [order]`.
    # Full-data windows must partition on (key, __chunk); the bare-user_id
    # window is the offset pass over hash-aggregated chunk totals only.
    parts = re.findall(r"Window \[.*\], \[(.*?)\], \[.*\]", plan)
    assert parts, plan
    bare = [p for p in parts if "__chunk" not in p]
    chunked = [p for p in parts if "__chunk" in p]
    assert chunked, "no chunk-partitioned window found:\n" + plan
    assert len(bare) <= 1, plan
    if bare:
        assert "HashAggregate" in plan


def test_null_key_and_null_ts_rows_survive(spark):
    """The plain window treats a NULL partition key (and a NULL ts) as an
    ordinary partition; the chunked decomposition's offset join must too
    — a plain inner equi-join silently DROPPED those rows."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1)
    rows = [
        (1, 0, base, 1.0),
        (1, 1, base + dt.timedelta(hours=2), 2.0),
        (None, 2, base, 5.0),
        (None, 3, base + dt.timedelta(hours=3), 7.0),
        (2, 4, None, 3.0),  # NULL ts -> NULL chunk
        (2, 5, base, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        (r.user_id, r.event_id): (r.running_sum, r.grn)
        for r in global_row_number(
            chunked_running_sum(
                df, ["user_id"], ["ts", "event_id"], "value"
            ),
            ["user_id"],
            ["ts", "event_id"],
            out_col="grn",
        ).collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = {
        (r.user_id, r.event_id): (r.s, r.n)
        for r in df.select(
            "user_id",
            "event_id",
            F.sum("value")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("s"),
            F.row_number().over(w).cast("long").alias("n"),
        ).collect()
    }
    assert got == want  # every row present, NULL key/ts included
