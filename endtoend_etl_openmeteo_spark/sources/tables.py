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


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize `events.ts` to TimestampType across parquet encodings.

    The testdata generator has shipped three physical encodings over time:
    TIMESTAMP(NANOS) (read as long via `nanosAsLong`), µs TIMESTAMP_NTZ
    (isAdjustedToUTC=false), and µs TIMESTAMP_LTZ. Downstream operators call
    `F.unix_micros`, which requires TIMESTAMP_LTZ, so all three converge here.
    The ns→µs narrowing uses exact integer division (`div 1000`, never
    `/ 1000.0` — ns epoch values exceed double's 2^53 exact range), matching
    DuckDB's truncation-toward-zero. The NTZ→LTZ cast is instant-preserving
    because the session timezone is pinned UTC (session.py).
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: Timestamp-typed columns per table — the columns a testdata regeneration
#: has historically re-encoded (NANOS in r1, µs-NTZ in r3). `events.ts` is
#: fully normalized to TIMESTAMP_LTZ because downstream operators need
#: `unix_micros`; orders/lineitem dates only repair the NANOS-as-long case
#: and otherwise keep the file's type so date-range predicates still push
#: into the scan un-cast (every call site is NTZ-safe date arithmetic).
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that latches ``spark.sql.legacy.parquet.nanosAsLong``
    ONLY when the file actually carries TIMESTAMP(NANOS) (the read fails
    schema conversion without the conf). The latch is one-way and
    session-wide — Spark consults it at scan planning, so flipping it
    back under lazily-executed frames would be unsafe — but a session
    that never touches the NANOS testdata generation now keeps the
    default, instead of every other parquet read in the session silently
    decoding nanos timestamp columns as longs."""
    try:
        return spark.read.parquet(path)
    except Exception:
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true":
            raise  # the conf wasn't the problem
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            return spark.read.parquet(path)
        except Exception:
            # The failure wasn't a nanos issue (missing/corrupt file):
            # leave no session-wide latch behind — no returned frame
            # depends on it at this point, so the reset is safe.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
            raise


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table at the given scale-factor directory.

    `events` goes through :func:`_normalize_events_ts` so `ts` is always
    TimestampType regardless of the file's physical encoding; other tables'
    timestamp columns repair the NANOS-as-long encoding if it ever appears.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name in _TS_COLS:
        df = _read_parquet_nanos_safe(spark, f"{sf_dir}/{name}.parquet")
        if name == "events":
            return _normalize_events_ts(df)
        for col in _TS_COLS[name]:
            if isinstance(df.schema[col].dataType, T.LongType):
                df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_between(spark: SparkSession, sf_dir: str, start_iso: str, end_iso: str) -> DataFrame:
    """Half-open time-range scan of events with REAL parquet pushdown.

    When ``ts`` is derived (timestamp_micros over a raw ns long, or a cast
    from TIMESTAMP_NTZ), a filter on the derived column cannot reach the
    parquet reader — at 100 TB that's a full scan. This helper filters the
    RAW column with literals of the column's own physical type (pushed into
    row-group stats) and converts afterwards.

    Bound strings parse ONCE driver-side with a single convention shared
    by all three encodings: explicit UTC offsets are honored, naive
    strings mean UTC wall clock (the session pin), fractional seconds
    survive at µs precision. Per-branch string handling previously let
    the NANOS path shift offset-bearing bounds and truncate fractions
    while the µs paths did not — same call, different rows per encoding.
    """
    import datetime as dt

    def utc_naive(iso: str) -> dt.datetime:
        d = dt.datetime.fromisoformat(iso)
        if d.tzinfo is not None:
            d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return d

    def ns(d: dt.datetime) -> int:
        # exact integer arithmetic — ns epochs exceed double's 2^53 range
        delta = d - dt.datetime(1970, 1, 1)
        return (delta.days * 86_400 + delta.seconds) * 10**9 + delta.microseconds * 1_000

    lo, hi = utc_naive(start_iso), utc_naive(end_iso)
    raw = _read_parquet_nanos_safe(spark, f"{sf_dir}/events.parquet")
    raw_type = raw.schema["ts"].dataType
    if isinstance(raw_type, T.LongType):
        return raw.filter(
            (F.col("ts") >= F.lit(ns(lo))) & (F.col("ts") < F.lit(ns(hi)))
        ).withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Literal construction must NOT go through F.lit(naive datetime):
    # PySpark converts that via the DRIVER OS timezone (time.mktime), not
    # the pinned-UTC session timezone, shifting the bounds by the host's
    # UTC offset on any non-UTC machine — per-encoding row divergence,
    # the exact bug this helper exists to prevent. ISO strings cast in
    # the engine (wall-clock for NTZ, session-UTC for LTZ) and integer
    # micros are both OS-timezone-independent.
    if isinstance(raw_type, T.TimestampNTZType):
        # Filter the NTZ column against NTZ literals (session tz pinned UTC
        # makes the wall-clock literal the right instant) so the predicate
        # pushes into the parquet scan, THEN cast to LTZ.
        return raw.filter(
            (F.col("ts") >= F.lit(lo.isoformat(sep=" ")).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(hi.isoformat(sep=" ")).cast("timestamp_ntz"))
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    return raw.filter(
        (F.col("ts") >= F.timestamp_micros(F.lit(ns(lo) // 1000)))
        & (F.col("ts") < F.timestamp_micros(F.lit(ns(hi) // 1000)))
    )
