"""Gap detection + incremental-processing log (SURVEY.md §2.3 J1, §2.9 T3/T5,
§7 step 5).

Re-expresses the reference's weekly backfill gap query
(``airflow/dags/backfill_openmeteo.py:44-75``) — generate the expected hourly
series, subtract what exists, per key — fixing its ``timestamp_utc`` column
bug (SURVEY §8 D1) by construction.

Scale: the expected side is (keys × hours), tiny relative to facts, and
broadcast into the anti-join; the facts side is reduced to DISTINCT
(key, hour) — one shuffle — before the join.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floor_to_utc_hour(bound: dt.datetime) -> dt.datetime:
    """Normalize a (possibly tz-aware) bound to naive UTC, truncated to
    the hour — THE bound convention shared by :func:`expected_hours` and
    :func:`find_missing_hours`. One helper by design: the expected
    series and the windowed fact filter must floor identically, or every
    hour in the divergence window reads as missing and triggers a
    spurious backfill. (strftime drops tzinfo, so formatting an aware
    non-UTC datetime naively would shift the series vs the UTC facts.)"""
    if bound.tzinfo is not None:
        bound = bound.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return bound.replace(minute=0, second=0, microsecond=0)


def expected_hours(
    keys: DataFrame, start: dt.datetime, end: dt.datetime, key_cols: list[str]
) -> DataFrame:
    """Cross product of keys × hourly series over [start, end] inclusive.

    Bounds are truncated to the hour (the reference's X11
    ``.replace(minute=0, second=0, microsecond=0)``, etl_openmeteo.py:37) —
    a 06:30 start must generate 06:00/07:00/... so the series aligns with
    the hour-truncated existing side; unaligned bounds would otherwise
    declare EVERY hour missing and trigger a full spurious backfill.
    """
    start = _floor_to_utc_hour(start)
    end = _floor_to_utc_hour(end)
    series = F.sequence(
        F.lit(start.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"),
        F.lit(end.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"),
        F.expr("INTERVAL 1 HOUR"),
    )
    return keys.select(*key_cols).distinct().select(
        *key_cols, F.explode(series).alias("expected_hour")
    )


def find_missing_hours(
    existing: DataFrame,
    start: dt.datetime,
    end: dt.datetime,
    key_cols: list[str],
    ts_col: str = "timestamp",
    keys: DataFrame | None = None,
) -> DataFrame:
    """Hours with no row per key: expected series anti-join existing hours.

    ``keys`` defaults to the distinct keys of ``existing`` (the reference
    discovers cities from partitions, S5); pass the city dimension to also
    detect wholly-missing keys.
    """
    key_src = keys if keys is not None else existing
    expected = expected_hours(key_src, start, end, key_cols)
    # Bound the fact scan to the checked window BEFORE the distinct: rows
    # outside [start, end+1h) can never match the expected series, so the
    # raw-ts range filter (pushdown-eligible, unlike a filter on the
    # truncated column) keeps a last-week gap check from shuffling ten
    # years of history. +1h on the upper bound covers rows inside end's
    # hour-truncation bucket.
    lo = _floor_to_utc_hour(start)
    hi = _floor_to_utc_hour(end) + dt.timedelta(hours=1)
    windowed = existing.filter(
        (F.col(ts_col) >= F.lit(lo.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"))
        & (F.col(ts_col) < F.lit(hi.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"))
    )
    present = windowed.select(
        *key_cols, F.date_trunc("hour", F.col(ts_col)).alias("expected_hour")
    ).distinct()
    # No broadcast hint on `present`: it derives from the FACT table and can
    # be arbitrarily large; Catalyst/AQE sizes the anti-join at runtime
    # (the small expected side broadcasts whenever eligible).
    return expected.join(present, [*key_cols, "expected_hour"], "left_anti")


def chunk_hours(missing: DataFrame, key_cols: list[str], chunk_size: int = 24) -> DataFrame:
    """Group missing hours into fetch batches of ≤chunk_size per key —
    the 24-hour API chunking of backfill_openmeteo.py:117-124, as a
    rank-based bucket id instead of a driver-side loop."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("expected_hour")
    return missing.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / chunk_size).cast("long"),
    )


def filter_new_files(
    candidates: DataFrame, ingest_log: DataFrame | None, key_col: str = "key"
) -> DataFrame:
    """Already-processed skip (F5/J2/T3): candidates minus logged keys via
    left_anti — the batch analog of a streaming checkpoint."""
    if ingest_log is None:
        return candidates
    return candidates.join(
        ingest_log.select(key_col).distinct(), key_col, "left_anti"
    )


def log_ingested(processed: DataFrame, log_path: str) -> None:
    """Append processed-file records (bucket, key, etag, rows_inserted,
    ingested_at) to the ingest log — load_to_postgres.py:174-185."""
    processed.write.mode("append").parquet(log_path)
