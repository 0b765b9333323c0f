"""Property-based tests (hypothesis) for the ragged-array explode policies
and the merge's last-write-wins invariants — the reference's two
semantics-critical custom pieces (SURVEY §7 hard parts)."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.explode import unzip_hourly
from endtoend_etl_openmeteo_spark.operators.merge import dedup_last_write_wins
from endtoend_etl_openmeteo_spark.schemas import WEATHER_HOURLY_SCHEMA
from tests.test_weather_pipeline import _bronze_df, _payload

measures = st.lists(
    st.one_of(st.none(), st.floats(-50, 50, allow_nan=False)), max_size=6
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_hours=st.integers(0, 6),
    temps=measures,
    precips=measures,
    winds=measures,
)
def test_explode_policy_invariants(spark, n_hours, temps, precips, winds):
    times = [f"2025-10-01T{h:02d}:00" for h in range(n_hours)]
    df = _bronze_df(
        spark, [_payload("Warsaw", "2025-10-01", "00", times, temps, precips, winds)]
    )
    at = F.lit("2025-10-01").cast("timestamp")

    padded = unzip_hourly(df, policy="nullpad", ingested_at=at).collect()
    truncated = unzip_hourly(df, policy="truncate", ingested_at=at).collect()

    # nullpad: one row per index of the LONGEST array whose time is non-null
    longest = max(n_hours, len(temps), len(precips), len(winds))
    assert len(padded) == min(n_hours, longest)  # rows need a time value
    # truncate: exactly min-length rows (the fully-paired prefix)
    assert len(truncated) == min(n_hours, len(temps), len(precips), len(winds))
    # truncate's rows are a prefix-subset of nullpad's rows
    pad_by_ts = {r.timestamp: r for r in padded}
    for r in truncated:
        p = pad_by_ts[r.timestamp]
        assert (r.temperature_2m, r.precipitation, r.wind_speed_10m) == (
            p.temperature_2m, p.precipitation, p.wind_speed_10m,
        )
    # within the paired prefix, values survive exactly (index alignment)
    for i, r in enumerate(sorted(truncated, key=lambda r: r.timestamp)):
        assert r.temperature_2m == temps[i]
        assert r.precipitation == precips[i]
        assert r.wind_speed_10m == winds[i]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    updates=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10), st.floats(-5, 45, allow_nan=False)),
        min_size=1,
        max_size=12,
    )
)
def test_last_write_wins_matches_sequential_upsert(spark, updates):
    """The window dedup must equal a row-at-a-time ON CONFLICT DO UPDATE
    replay (the reference's loader semantics, load_to_postgres.py:96-99)."""
    base_ts = dt.datetime(2025, 10, 1)
    rows = [
        ("Warsaw", base_ts + dt.timedelta(hours=key), temp, 0.0, 1.0,
         base_ts + dt.timedelta(minutes=ing))
        for (key, ing, temp) in updates
    ]
    df = spark.createDataFrame(rows, WEATHER_HOURLY_SCHEMA)
    got = {
        (r.city, r.timestamp): r.temperature_2m
        for r in dedup_last_write_wins(df, ["city", "timestamp"], "_ingested_at").collect()
    }

    # sequential replay in _ingested_at order: later write wins
    expected = {}
    for city, ts, temp, _p, _w, ing in sorted(rows, key=lambda r: r[5]):
        expected[(city, ts)] = temp
    assert set(got) == set(expected)
    for k in expected:
        # ties on _ingested_at: any of the tied values is acceptable
        tied = [r[2] for r in rows
                if (r[0], r[1]) == k and r[5] == max(r2[5] for r2 in rows if (r2[0], r2[1]) == k)]
        assert got[k] in tied
