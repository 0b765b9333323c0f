"""Time-series queries: range/tz filters, daily marts, series generation,
gap detection, upsert dedup, sessionization (SURVEY.md §2.2 F1/F2, §2.4 A1/A3,
§2.7 X7/X9/X12, §2.3 J1, §2.1 S8, §2.9).

The `events` table stands in for `weather_hourly`: (user_id, ts) keyed rows,
`event_type` playing the city role. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.plans.registry import register
from endtoend_etl_openmeteo_spark.sources.tables import events_between, tbl

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@register(
    "q_range_filter",
    oracle="""
    SELECT event_id, ts, event_type, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-17'
    """,
    doc="Half-open time-range filter (SURVEY §2.2 F1, §2.5 O6) — the 6-hour "
    "extract window of etl_openmeteo.py:72-74, start <= ts < end. Filters "
    "the raw ns column so the predicate reaches parquet row-group stats "
    "(a filter on the derived timestamp would scan everything).",
    tags=("filter",),
)
def q_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_between(spark, sf_dir, "2024-01-10", "2024-01-17").select(
        "event_id", "ts", "event_type", "value"
    )


@register(
    "q_tz_filter",
    # The Warsaw conversion normalizes ts to NAIVE UTC first (typeof
    # CASE): under the µs-LTZ events encoding DuckDB reads ts as
    # TIMESTAMPTZ and the bare timezone('UTC', ts) idiom would invert
    # the conversion direction (validated live) — the CASE makes the
    # oracle hold under every encoding the testdata generator has
    # shipped, in any DuckDB session timezone.
    oracle="""
    WITH n AS (
      SELECT event_id, ts,
             CASE WHEN typeof(ts) LIKE '%TIME ZONE%'
                  THEN timezone('UTC', ts::TIMESTAMPTZ)
                  ELSE ts::TIMESTAMP END AS ts_utc
      FROM events
    )
    SELECT event_id, ts,
           timezone('Europe/Warsaw', timezone('UTC', ts_utc)) AS local_ts
    FROM n
    WHERE EXTRACT(hour FROM timezone('Europe/Warsaw', timezone('UTC', ts_utc))) < 12
    """,
    doc="Timezone-aware cutoff (SURVEY §2.2 F2, §2.7 X9) — the 'before noon "
    "Warsaw' rule of fetch_october_2025.py:92-97. Storage stays UTC; the "
    "local-time view is an explicit from_utc_timestamp.",
    tags=("filter", "timezone"),
)
def q_tz_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    local_ts = F.from_utc_timestamp("ts", "Europe/Warsaw")
    return (
        tbl(spark, sf_dir, "events")
        .select("event_id", "ts", local_ts.alias("local_ts"))
        .filter(F.hour("local_ts") < 12)
    )


@register(
    "q_daily_agg",
    oracle="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           round(avg(value), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc="The core mart: GROUP BY key + day with AVG (SURVEY §2.4 A1) — "
    "fct_city_day.sql:2-9. Hash aggregate with map-side partial agg; one "
    "shuffle on (event_type, day), the natural partitioning for the mart.",
    tags=("aggregate", "mart"),
)
def q_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
    )


@register(
    "q_daily_agg_full",
    oracle="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           round(avg(value), 6) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           round(sum(value), 4) AS sum_value,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="The docs' extended mart (SURVEY §2.4 A3, discrepancy D3): "
    "min/max/sum/avg/count in ONE aggregate pass — "
    "docs/dashboard.md:89-95. Sum rounded to 4dp: cross-engine summation "
    "order differs at ~1e-10.",
    tags=("aggregate", "mart"),
)
def q_daily_agg_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q_sequence",
    oracle="""
    SELECT event_type,
           unnest(generate_series(TIMESTAMP '2024-01-01',
                                  TIMESTAMP '2024-01-01 23:00:00',
                                  INTERVAL 1 HOUR)) AS hour
    FROM (SELECT DISTINCT event_type FROM events)
    """,
    doc="Hour-series generation (SURVEY §2.7 X12) — the while-loop of "
    "backfill_openmeteo.py:46-50 as sequence()+explode: pure codegen, no "
    "driver loop, scales to any span.",
    tags=("generator",),
)
def q_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    hours = F.sequence(
        F.lit("2024-01-01 00:00:00").cast("timestamp"),
        F.lit("2024-01-01 23:00:00").cast("timestamp"),
        F.expr("INTERVAL 1 HOUR"),
    )
    return (
        tbl(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .select("event_type", F.explode(hours).alias("hour"))
    )


@register(
    "q_gap_detect",
    oracle="""
    WITH types AS (SELECT DISTINCT event_type FROM events),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-07 23:00:00',
                                    INTERVAL 1 HOUR)) AS expected_hour
    ),
    existing AS (
      SELECT DISTINCT event_type, date_trunc('hour', ts) AS expected_hour
      FROM events
    )
    SELECT t.event_type, h.expected_hour
    FROM types t CROSS JOIN hours h
    WHERE NOT EXISTS (
      SELECT 1 FROM existing e
      WHERE e.event_type = t.event_type AND e.expected_hour = h.expected_hour
    )
    """,
    doc="Gap detection (SURVEY §2.3 J1, §2.9 T5): expected hour series × key "
    "dim, anti-joined against existing DISTINCT hours — "
    "backfill_openmeteo.py:44-75, with its timestamp_utc column bug (D1) "
    "fixed by construction. Plan shape: Spark can only broadcast the "
    "BUILD (right) side of a LeftAnti join, so the expected stream side "
    "is never broadcast itself; the DISTINCT over the facts shuffles "
    "map-side-combined hour/key pairs (bounded by keys × hours, tiny "
    "relative to the fact scan) and that deduplicated set is what AQE "
    "broadcasts back against the expected series.",
    tags=("join", "anti", "generator"),
)
def q_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    types = ev.select("event_type").distinct()
    hours = F.sequence(
        F.lit("2024-01-01 00:00:00").cast("timestamp"),
        F.lit("2024-01-07 23:00:00").cast("timestamp"),
        F.expr("INTERVAL 1 HOUR"),
    )
    expected = types.select("event_type", F.explode(hours).alias("expected_hour"))
    existing = ev.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("expected_hour")
    ).distinct()
    return expected.join(existing, ["event_type", "expected_hour"], "left_anti")


@register(
    "q_gapfill_locf",
    oracle="""
    WITH types AS (SELECT DISTINCT event_type FROM events),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-07 23:00:00',
                                    INTERVAL 1 HOUR)) AS hour
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             round(avg(value), 6) AS avg_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      GROUP BY 1, 2
    )
    SELECT t.event_type, h.hour, y.avg_value,
           last_value(y.avg_value IGNORE NULLS) OVER (
             PARTITION BY t.event_type ORDER BY h.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           CAST(y.avg_value IS NULL AS BIGINT) AS was_gap
    FROM types t
    CROSS JOIN hours h
    LEFT JOIN hourly y ON y.event_type = t.event_type AND y.hour = h.hour
    """,
    doc="Gap-fill with last-observation-carried-forward (the natural read "
    "path over the gap-detected mart — backfill_openmeteo.py:44-75 finds "
    "the holes, this serves a dense series across them). Dense hour grid "
    "(dim × sequence, tiny, broadcast) left-joined to the hourly "
    "aggregate, then one ignorenulls last() window per key. Two shuffles "
    "total at any scale: the hourly agg and the per-key window sort.",
    tags=("window", "generator", "timeseries"),
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    hourly = (
        events_between(spark, sf_dir, "2024-01-01", "2024-01-08")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
    )
    hours = F.sequence(
        F.lit("2024-01-01 00:00:00").cast("timestamp"),
        F.lit("2024-01-07 23:00:00").cast("timestamp"),
        F.expr("INTERVAL 1 HOUR"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select("event_type", F.explode(hours).alias("hour"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("avg_value").isNull().cast("long").alias("was_gap"),
    )


@register(
    "q_interp_linear",
    oracle="""
    WITH types AS (SELECT DISTINCT event_type FROM events),
    hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-07 23:00:00',
                                    INTERVAL 1 HOUR)) AS hour
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             round(avg(value), 6) AS avg_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      GROUP BY 1, 2
    ),
    g AS (
      SELECT t.event_type, h.hour, y.avg_value,
             CASE WHEN y.avg_value IS NOT NULL THEN h.hour END AS known_ts
      FROM types t
      CROSS JOIN hours h
      LEFT JOIN hourly y ON y.event_type = t.event_type AND y.hour = h.hour
    ),
    f AS (
      SELECT event_type, hour, avg_value,
             last_value(avg_value IGNORE NULLS) OVER wp AS prev_val,
             last_value(known_ts  IGNORE NULLS) OVER wp AS prev_ts,
             first_value(avg_value IGNORE NULLS) OVER wn AS next_val,
             first_value(known_ts  IGNORE NULLS) OVER wn AS next_ts
      FROM g
      WINDOW wp AS (PARTITION BY event_type ORDER BY hour
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY hour
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour, avg_value,
           round(CASE
             WHEN prev_val IS NULL THEN next_val
             WHEN next_val IS NULL THEN prev_val
             WHEN next_ts = prev_ts THEN prev_val
             ELSE prev_val + (next_val - prev_val)
                  * ((epoch_us(hour) - epoch_us(prev_ts))
                     / (epoch_us(next_ts) - epoch_us(prev_ts)))
           END, 6) AS interp_value
    FROM f
    """,
    doc="Linear interpolation across series gaps (the smooth-fill sibling "
    "of q_gapfill_locf): bracket each grid hour with the nearest known "
    "values via one ignorenulls last() (preceding) and first() "
    "(following) window pair, then lerp on exact microsecond offsets. "
    "Both frames share the (event_type, hour) sort — one shuffle serves "
    "all four window expressions. Leading/trailing gaps degrade to "
    "nearest-known; interior gaps interpolate.",
    tags=("window", "generator", "timeseries"),
)
def q_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    hourly = (
        events_between(spark, sf_dir, "2024-01-01", "2024-01-08")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
    )
    hours = F.sequence(
        F.lit("2024-01-01 00:00:00").cast("timestamp"),
        F.lit("2024-01-07 23:00:00").cast("timestamp"),
        F.expr("INTERVAL 1 HOUR"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select("event_type", F.explode(hours).alias("hour"))
    )
    g = grid.join(hourly, ["event_type", "hour"], "left").withColumn(
        "known_ts", F.when(F.col("avg_value").isNotNull(), F.col("hour"))
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_val = F.last("avg_value", ignorenulls=True).over(wp)
    prev_ts = F.last("known_ts", ignorenulls=True).over(wp)
    next_val = F.first("avg_value", ignorenulls=True).over(wn)
    next_ts = F.first("known_ts", ignorenulls=True).over(wn)
    frac = (F.unix_micros(F.col("hour")) - F.unix_micros(prev_ts)) / (
        F.unix_micros(next_ts) - F.unix_micros(prev_ts)
    )
    interp = (
        F.when(prev_val.isNull(), next_val)
        .when(next_val.isNull(), prev_val)
        .when(next_ts == prev_ts, prev_val)
        .otherwise(prev_val + (next_val - prev_val) * frac)
    )
    return g.select(
        "event_type", "hour", "avg_value", F.round(interp, 6).alias("interp_value")
    )


@register(
    "q_upsert",
    oracle="""
    SELECT user_id, event_type, ts, event_id, value FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
    doc="Upsert/merge semantics (SURVEY §2.1 S8, §2.3 J4, §2.9 T4): "
    "last-write-wins keyed dedup via row_number window — the ON CONFLICT "
    "DO UPDATE of load_to_postgres.py:89-102. The full partition-scoped "
    "merge lives in operators/merge.py; this query is its dedup core. "
    "Shuffles once on the key — the window needs no global sort.",
    tags=("window", "merge"),
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        tbl(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "q_window_lag",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_us
    FROM events
    """,
    doc="lag() window (extension surface, SURVEY §2.8): inter-event gap per "
    "user in exact microseconds (unix_micros avoids float epoch rounding).",
    tags=("window",),
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    um = F.unix_micros(F.col("ts"))
    return tbl(spark, sf_dir, "events").select(
        "user_id", "event_id", (um - F.lag(um).over(w)).alias("gap_us")
    )


@register(
    "q_session_window",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess,
             event_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM g
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="Built-in session_window aggregation (SURVEY §7 step 6/7): dynamic-"
    "gap session windows (30 min) — works identically in batch and "
    "streaming (with a watermark). Window end = last event + gap; the "
    "oracle replicates via lag/cumsum (a >= gap starts a new session, "
    "matching the half-open window end).",
    tags=("window", "sessionize", "streaming"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ), 6) AS mov_avg,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING
           ), 4) AS running_sum
    FROM events
    """,
    doc="Moving average + running sum with explicit ROWS frames (extension "
    "surface, SURVEY §2.8): one shuffle on user_id serves both frames.",
    tags=("window",),
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    mov = base.rowsBetween(-3, Window.currentRow)
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return tbl(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(mov), 6).alias("mov_avg"),
        F.round(F.sum("value").over(run), 4).alias("running_sum"),
    )


@register(
    "q_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess,
             event_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM s GROUP BY 1, 2
    """,
    doc="Sessionization (SURVEY §7 step 7): lag-gap > 30 min starts a new "
    "session; session id = running count of session starts. One shuffle "
    "on user_id serves both windows and the final aggregate (same key).",
    tags=("window", "sessionize"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    um = F.unix_micros(F.col("ts"))
    gap = um - F.lag(um).over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        tbl(spark, sf_dir, "events")
        .withColumn("session_id", F.sum(new_sess).over(running).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@register(
    "q_scd2",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      FROM events),
    grouped AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged),
    runs AS (
      SELECT user_id, event_type, grp,
             min(ts) AS valid_from, count(*) AS n_events
      FROM grouped GROUP BY 1, 2, 3)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER w AS valid_to,
           lead(valid_from) OVER w IS NULL AS is_current,
           n_events
    FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, grp)
    """,
    doc="SCD Type-2 dimension build (extension surface): collapse each "
    "user's consecutive runs of the same event_type into validity "
    "intervals [valid_from, valid_to) with an is_current flag — the "
    "gaps-and-islands change-capture every warehouse ships. Change flag "
    "(lag) + running sum + lead all share ONE hash partitioning on "
    "user_id, so the whole history rebuild is a single shuffle followed "
    "by per-key sorts — embarrassingly parallel across users at 100 TB.",
    tags=("window", "timeseries", "scd"),
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(wo)
    # eqNullSafe mirrors the oracle's IS DISTINCT FROM: a NULL event_type
    # after a non-null one must START a run (plain != yields NULL there,
    # which otherwise(0) would silently swallow).
    chg = F.when(~prev.eqNullSafe(F.col("event_type")), 1).otherwise(0)
    running = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = (
        tbl(spark, sf_dir, "events")
        .withColumn("__chg", chg)
        .withColumn("__grp", F.sum("__chg").over(running))
        .groupBy("user_id", "event_type", "__grp")
        .agg(F.min("ts").alias("valid_from"), F.count("*").alias("n_events"))
    )
    # Order by (valid_from, __grp): two runs of one user can share valid_from
    # (distinct events at the identical timestamp), and valid_from alone would
    # leave lead()/is_current tie-order-dependent across runs and engines.
    # __grp is the run sequence number, so the order is total.
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "__grp")
    valid_to = F.lead("valid_from").over(w2)
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )


@register(
    "q_ohlc",
    oracle="""
    WITH e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             ts, event_id, value
      FROM events
    ), r AS (
      SELECT bucket, value,
             row_number() OVER (PARTITION BY bucket ORDER BY ts, event_id)
               AS rn_a,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT bucket,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*)::BIGINT AS volume
    FROM r GROUP BY bucket
    """,
    doc="Hourly OHLC candlesticks over the event stream (the TimescaleDB/"
    "kdb resample staple): open/close via min_by/max_by on the (ts, "
    "event_id) order key — one hash aggregate, no window over the fact "
    "stream, so the plan is a single map-side-combined exchange at any "
    "scale. Ties broken by event_id for cross-engine determinism.",
    tags=("timeseries",),
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ordkey = F.struct("ts", "event_id")
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.min_by("value", ordkey).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.max_by("value", ordkey).alias("close"),
            F.count("*").alias("volume"),
        )
    )


@register(
    "q_twap",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             value, epoch_us(ts) AS um,
             lead(epoch_us(ts)) OVER (
               PARTITION BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
               ORDER BY ts, event_id
             ) AS next_um
      FROM events
    )
    SELECT event_type, day,
           round(sum(value * (next_um - um)) / sum(next_um - um), 6) AS twap
    FROM e WHERE next_um IS NOT NULL
    GROUP BY event_type, day
    """,
    doc="Time-weighted average price/value per (event_type, day) — the "
    "irregular-sampling average a plain AVG gets wrong (TimescaleDB "
    "time_weight analog): each observation weighted by its holding time "
    "to the next one, exact integer microsecond weights. One window sort "
    "per key group, then a hash aggregate on the same key — the sort "
    "partitioning is reused, no second shuffle.",
    tags=("timeseries",),
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `day` must be a materialized column BEFORE the window so the
    # follow-up aggregate's (event_type, day) grouping provably matches the
    # window's hash partitioning — keyed on the raw expression, Catalyst
    # plans a second exchange (verified by the plan-shape test).
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    um = F.unix_micros(F.col("ts"))
    events = (
        tbl(spark, sf_dir, "events")
        .withColumn("day", F.date_trunc("day", "ts"))
        .withColumn("dt_us", (F.lead(um).over(w) - um).cast("double"))
    )
    return (
        events.filter(F.col("dt_us").isNotNull())
        .groupBy("event_type", "day")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6
            ).alias("twap")
        )
    )


@register(
    "q_stream_window",
    oracle="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS n, round(avg(value), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc="Structured-Streaming windowed aggregate, hash-checked against the "
    "BATCH oracle — streaming-equals-batch parity as a driver-grade "
    "contract, not just a pytest. The events table lands as a file "
    "stream (two micro-batches); a tumbling 1-day event-time window "
    "behind a 1-hour watermark aggregates in APPEND mode (the scale "
    "path: state purges as the watermark passes each window, emitted "
    "rows are final — no complete-mode re-emission of the whole result "
    "per batch). Batch 1 is the corpus; batch 2 a fence row 30 days "
    "past the horizon (advances the watermark so every real window "
    "closes and emits; its own window never does); batch 3 a LATE row "
    "at the stream's minimum event time, which the watermark must DROP. "
    "The probe rides TWO batches behind the data whose watermark drops "
    "it: SPARK-40925's two-watermark split filters batch N's late rows "
    "with the watermark of batch N-1, which is computed from data seen "
    "through batch N-2 — measured here: a probe one batch after the "
    "fence-carrying batch leaks (its filter watermark predates the "
    "fence). The corpus watermark (hi - 1h) is what drops the probe; "
    "the fence's job is closing windows. Batch order is pinned with "
    "explicit strictly-increasing mtimes (FileStreamSource orders by "
    "modification time — coarse filesystem timestamp granularity must "
    "not co-batch the probe with the fence). If the probe leaked into "
    "the first "
    "day's window, its count would shift and the oracle hash would catch "
    "it. Exactly-once file sink + checkpoint, same lifecycle as "
    "production (streaming/pipeline.py T1-T4).",
    tags=("streaming", "aggregate"),
)
def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from datetime import timedelta

    from endtoend_etl_openmeteo_spark.plans.stream_harness import (
        run_stream_to_parquet,
        stamp_wave_mtimes,
    )
    from endtoend_etl_openmeteo_spark.session import scratch_dir

    events = tbl(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    bounds = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    work = scratch_dir(prefix="stream_window_")
    landing, out = f"{work}/landing", f"{work}/out"
    try:
        # batch 1: the corpus (whose watermark hi-1h is what ultimately
        # drops the probe); batch 2: watermark fence; batch 3: late probe
        # (must trail the corpus by TWO micro-batches, see doc).
        sch = "event_id bigint, ts timestamp, event_type string, value double"

        def one_row(eid: int, ts, etype: str, value: float):
            # JVM-side literal row: a createDataFrame-backed write launches
            # a Python runner per task (~5 s worker spin-up measured here);
            # a literal projection over range(1) stays in codegen.
            return spark.range(1).select(
                F.lit(eid).cast("bigint").alias("event_id"),
                F.lit(ts.isoformat()).cast("timestamp").alias("ts"),
                F.lit(etype).alias("event_type"),
                F.lit(value).alias("value"),
            )

        import os

        events.coalesce(1).write.mode("append").parquet(landing)
        wave1 = {(landing, f) for f in os.listdir(landing)}
        one_row(-1, bounds["hi"] + timedelta(days=30), "__fence__", 0.0).coalesce(
            1
        ).write.mode("append").parquet(landing)
        wave2 = {(landing, f) for f in os.listdir(landing)}
        one_row(-2, bounds["lo"], "__late__", 1.0e6).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        # corpus < fence < probe — the probe provably arrives one batch
        # after the fence
        stamp_wave_mtimes([landing], [wave1, wave2])
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.avg("value"), 6).alias("avg_value"),
            )
            .select("event_type", F.col("w.start").alias("day"), "n", "avg_value")
        )
        # ONE state partition: the aggregate's state is (day-window ×
        # event_type) ≈ a few hundred keys, and every micro-batch commits
        # one state store per partition — 4 partitions paid 4 store
        # commits × 3 micro-batches of pure fixed cost (A/B r13: 2.69 →
        # 2.39 s warm, repeated). Production sizes this to key
        # cardinality (run_stream_to_parquet's documented contract).
        run_stream_to_parquet(
            spark, agg, out, f"{work}/ckpt", shuffle_partitions=1
        )
        # eager checkpoint: the result must outlive the scratch cleanup
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_stream_join",
    oracle="""
    SELECT l.event_id AS l_id, r.event_id AS r_id,
           l.event_type AS event_type, l.user_id AS user_id,
           l.ts AS l_ts, r.ts AS r_ts,
           round(r.value, 6) AS r_value
    FROM events l JOIN events r
      ON l.event_type = r.event_type AND l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 24 HOUR
    WHERE l.event_id % 20 = 0 AND r.user_id % 2 = 0
      AND l.event_id <> r.event_id
    """,
    doc="Watermarked stream-stream interval join, hash-checked against the "
    "BATCH interval-join oracle — the reference's late-corrections "
    "enrichment shape (T2, `/root/reference/etl_openmeteo.py:37-38`) in "
    "streaming form, as a driver-grade parity row (the q_stream_window "
    "pattern applied to streaming/pipeline.stream_stream_join). Left "
    "stream: the 5% event_id%20==0 slice (the 'corrections'); right: the "
    "full event stream; each left row pairs with right rows sharing "
    "(event_type, user_id) in [l_ts, l_ts+24h]. The COMPOSITE key is the "
    "scale lesson, not a convenience: Spark's symmetric hash join scans "
    "every buffered state value for the probing row's key, so a "
    "5-value key (event_type alone) degenerates to |left|x|right|/5 "
    "comparisons per micro-batch (measured 13 s for one sf0.1 batch); "
    "keyed by (type, user) the same corpus probes ~50 values per row. "
    "Both sides land as file streams; batch 1 is the corpus (both "
    "sides), batch 2 non-matching fence rows 30 days past the horizon "
    "(distinct types per side so they can never pair), batch 3 a LATE "
    "left probe at the stream's minimum event time carrying a real "
    "(type, user) from the corpus — if the watermark failed to drop it, "
    "it would emit pairs with l_id=-20 and break the oracle hash. The "
    "probe trails the corpus by TWO micro-batches (SPARK-40925's "
    "two-batch watermark lag, measured in q_stream_window); batch order "
    "is pinned with explicit strictly-increasing mtimes per landing "
    "dir. Inner mode emits pairs as both sides arrive — no window close "
    "needed; the event-time range condition is what lets Spark bound "
    "both sides' join state (buffered rows are evicted once the "
    "opposing watermark passes their match horizon) — without it "
    "stream-stream state grows forever.",
    tags=("streaming", "join"),
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    from datetime import timedelta

    from endtoend_etl_openmeteo_spark.plans.stream_harness import (
        run_stream_to_parquet,
        stamp_wave_mtimes,
    )
    from endtoend_etl_openmeteo_spark.session import scratch_dir
    from endtoend_etl_openmeteo_spark.streaming.pipeline import (
        stream_stream_join,
    )

    events = tbl(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # the two stream slices: corrections (5% of events) vs the even-user
    # half of the base stream — the right thinning halves the join-state
    # volume every micro-batch pays to buffer/commit, with the oracle
    # mirroring the same predicate
    left_b = events.filter(F.col("event_id") % 20 == 0)
    right_b = events.filter(F.col("user_id") % 2 == 0)
    ordkey = F.struct("ts", "event_id")
    bounds = right_b.agg(
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        # the late probe must carry a REAL (type, user) PRESENT IN THE
        # RIGHT SLICE so a watermark failure would visibly emit pairs —
        # take the earliest right-side row's; its ts is within 24h of
        # that row by construction
        F.min_by("event_type", ordkey).alias("lo_type"),
        F.min_by("user_id", ordkey).alias("lo_user"),
    ).collect()[0]
    work = scratch_dir(prefix="stream_join_")
    land_l, land_r, out = f"{work}/left", f"{work}/right", f"{work}/out"
    try:
        def one_row(eid: int, ts, user: int, etype: str, value: float):
            # JVM literal projection — see q_stream_window: a
            # createDataFrame-backed write spins up a Python runner per
            # task, pure fixed overhead here.
            return spark.range(1).select(
                F.lit(eid).cast("bigint").alias("event_id"),
                F.lit(ts.isoformat()).cast("timestamp").alias("ts"),
                F.lit(user).cast("bigint").alias("user_id"),
                F.lit(etype).alias("event_type"),
                F.lit(value).cast("double").alias("value"),
            )

        fence_ts = bounds["hi"] + timedelta(days=30)
        left_b.coalesce(1).write.mode("append").parquet(land_l)
        right_b.coalesce(1).write.mode("append").parquet(land_r)
        w1 = {(d, f) for d in (land_l, land_r) for f in os.listdir(d)}
        # -40 passes the left slice filter (-40 % 20 == 0) so the fence
        # row reaches the LEFT watermark node too, not just the right's
        one_row(-40, fence_ts, -1, "__fence_l__", 0.0).coalesce(1).write.mode(
            "append"
        ).parquet(land_l)
        one_row(-3, fence_ts, -1, "__fence_r__", 0.0).coalesce(1).write.mode(
            "append"
        ).parquet(land_r)
        w2 = {(d, f) for d in (land_l, land_r) for f in os.listdir(d)}
        # late LEFT probe: passes the %20 slice filter (-20 % 20 == 0) and
        # would match right rows at the stream's origin if it leaked
        one_row(
            -20, bounds["lo"], bounds["lo_user"], bounds["lo_type"], 1.0e6
        ).coalesce(1).write.mode("append").parquet(land_l)
        stamp_wave_mtimes([land_l, land_r], [w1, w2])
        sch = (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

        def file_stream(path: str) -> DataFrame:
            return (
                spark.readStream.schema(sch)
                .option("maxFilesPerTrigger", 1)
                .parquet(path)
            )

        left = file_stream(land_l).filter(F.col("event_id") % 20 == 0)
        right = file_stream(land_r)
        joined = stream_stream_join(
            left, right, keys=["event_type", "user_id"],
            left_ts="ts", right_ts="ts", tolerance="24 hours",
        ).filter(F.col("l.event_id") != F.col("r.event_id"))
        result = joined.select(
            F.col("l.event_id").alias("l_id"),
            F.col("r.event_id").alias("r_id"),
            F.col("l.event_type").alias("event_type"),
            F.col("l.user_id").alias("user_id"),
            F.col("l.ts").alias("l_ts"),
            F.col("r.ts").alias("r_ts"),
            F.round(F.col("r.value"), 6).alias("r_value"),
        )
        # 4 state partitions, not the session's 32: every micro-batch
        # commits one state store PER PARTITION PER JOIN SIDE, and this
        # harness runs 3 waves — 8 partitions measured 8.8 s warm, 4 → 4.4 s
        # (2 is no better: the join compute serializes). A production
        # deployment sizes this to the stream's key cardinality instead.
        run_stream_to_parquet(
            spark, result, out, f"{work}/ckpt", shuffle_partitions=4
        )
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
