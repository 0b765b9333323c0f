"""Window-function and multi-dimensional grouping queries (extension surface,
SURVEY.md §2.8 and §7 step 7 — the reference has no window functions; the
engine exposes them as first-class).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.plans.registry import register
from endtoend_etl_openmeteo_spark.sources.tables import tbl

PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
           ) AS BIGINT) AS rnk
    FROM orders
    QUALIFY rnk <= 3
    """,
    doc="Top-K per group via ranking window — the canonical Spark top-k "
    "(no global sort; one shuffle on the partition key).",
    tags=("window",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        tbl(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "q_rank_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="The full ranking-function family over one window definition "
    "(extension surface, SURVEY §2.8): one shuffle + per-partition sort "
    "serves all six functions.",
    tags=("window",),
)
def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return tbl(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q_rollup",
    oracle="""
    SELECT event_type, day, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value FROM events)
    GROUP BY ROLLUP (event_type, day)
    """,
    doc="ROLLUP hierarchy totals (extension surface): (type, day) → (type) → "
    "() in one pass — Spark expands to Expand + single hash aggregate.",
    tags=("aggregate", "rollup"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", F.col("ts")).alias("day"), "value")
        .rollup("event_type", "day")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


@register(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 4) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dims (extension surface).",
    tags=("aggregate", "cube"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT event_type, user_id, count(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id))
    """,
    doc="Explicit GROUPING SETS (extension surface) — per-type and per-user "
    "counts in one pass.",
    tags=("aggregate",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    # hashlib, not hash(): hash() is PYTHONHASHSEED-salted per process, which
    # would make the view name nondeterministic across runs.
    view = f"events_gs_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    ev.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT event_type, user_id, count(*) AS n
        FROM {view}
        GROUP BY GROUPING SETS ((event_type), (user_id))
        """
    )


@register(
    "q_skew_window",
    # Same contract as q_moving_avg — the point IS the identical oracle:
    # a hash-match proves the chunked execution is semantically the plain
    # window, while computing every hot key across many tasks.
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
    doc="Skew-resilient window execution (operators/skew.py): the "
    "q_moving_avg semantics computed WITHOUT Window.partitionBy's "
    "one-task-per-key serialization — running sum via two-phase chunk "
    "decomposition (within-chunk sums + cumulative chunk totals), "
    "ROWS-frame moving average via distributed row numbering + "
    "fixed-size blocks with halo rows. The one window shape AQE and "
    "salting can't fix at 100 TB (a hot user / 5-value event_type key "
    "serializes its whole history through one core); here the serial "
    "unit is a (key, time-bin) cell.",
    tags=("window", "skew"),
)
def q_skew_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.skew import (
        chunked_moving_agg,
        chunked_running_sum,
    )

    ev = tbl(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    keys, order = ["user_id"], ["ts", "event_id"]
    run = chunked_running_sum(
        ev, keys, order, "value", chunk_seconds=6 * 3600, out_col="running_sum"
    )
    mov = chunked_moving_agg(
        run,
        keys,
        order,
        "value",
        frame_rows=3,
        agg="avg",
        chunk_seconds=6 * 3600,
        out_col="mov_avg",
    )
    return mov.select(
        "user_id",
        "event_id",
        F.round("mov_avg", 6).alias("mov_avg"),
        F.round("running_sum", 4).alias("running_sum"),
    )


@register(
    "q_anomaly_zscore",
    oracle="""
    WITH rolled AS (
      SELECT user_id, ts, event_id, value,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sd,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id, value, round((value - mu) / sd, 6) AS z
    FROM rolled WHERE rn >= 24 AND abs((value - mu) / sd) > 2
    """,
    doc="Rolling z-score anomaly flags (extension surface): 24-row trailing "
    "mean/stddev per user, emit |z| > 2 once the window is full. One "
    "shuffle on user_id serves the rolling stats AND the row_number — "
    "same window ordering, single sort. At scale the per-user partitions "
    "are small and numerous (no hot key), the shape that parallelizes.",
    tags=("window", "timeseries"),
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-23, 0)
    wn = Window.partitionBy("user_id").orderBy(*order)
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    # try_divide: a user with 24 equal trailing values has sd exactly 0 —
    # ANSI division would kill the whole scan; NULL z is what DuckDB's
    # double division yields there too, and the |z|>2 filter drops it
    # (all-equal history means no anomaly)
    z = F.try_divide(F.col("value") - mu, sd)
    return (
        tbl(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            z.alias("__z"),
            F.row_number().over(wn).cast("long").alias("__rn"),
        )
        .filter((F.col("__rn") >= 24) & (F.abs("__z") > 2))
        .select(
            "user_id", "ts", "event_id", "value", F.round("__z", 6).alias("z")
        )
    )


@register(
    "q_ewma",
    # value IS NOT NULL on both sides: Spark's collect_list DROPS null
    # elements while DuckDB's list() keeps them, so a null value inside
    # the trailing window would silently shift both the weights and the
    # denominator between engines — the EWMA is defined over the
    # non-null value stream instead.
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS arr
      FROM events WHERE value IS NOT NULL)
    SELECT user_id, ts, event_id,
           round(list_sum(list_transform(arr, (x, i) -> x * pow(0.7, len(arr) - i)))
                 / list_sum(list_transform(arr, (x, i) -> pow(0.7, len(arr) - i))),
                 6) AS ewma
    FROM w
    """,
    doc="Exponentially weighted moving average (extension surface), "
    "alpha=0.3 over a 12-row trailing window: collect the frame as an "
    "array, weight by recency with an indexed transform, normalize by the "
    "weight sum (pandas ewm adjust=True semantics, truncated at 12 lags — "
    "the truncation bounds state so the plan is a plain windowed agg, no "
    "recursion). All JVM-side: collect_list window + higher-order "
    "functions. DuckDB lambda indexes are 1-based, Spark's 0-based — the "
    "exponent (n-i vs n-1-i) accounts for it.",
    tags=("window", "timeseries"),
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-11, 0)
    num = "aggregate(transform(arr, (x, i) -> x * pow(0.7D, size(arr) - 1 - i)), 0D, (a, x) -> a + x)"
    den = "aggregate(transform(arr, (x, i) -> pow(0.7D, size(arr) - 1 - i)), 0D, (a, x) -> a + x)"
    return (
        tbl(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())  # see the oracle note
        .select("user_id", "ts", "event_id", F.collect_list("value").over(w).alias("arr"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.expr(num) / F.expr(den), 6).alias("ewma"),
        )
    )


@register(
    "q_pivot",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY 1
    """,
    doc="Pivot day × event_type → counts (extension surface). Explicit value "
    "list so the plan is a single conditional aggregate — no extra pass to "
    "discover pivot values.",
    tags=("aggregate", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", PIVOT_EVENT_TYPES)
        .count()
    )
    # pivot-count yields null for empty cells; DuckDB's FILTER yields 0.
    return df.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in PIVOT_EVENT_TYPES]
    )


@register(
    "q_range_window",
    oracle="""
    SELECT user_id, ts, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(value) OVER w, 4) AS sum_1h,
           round(avg(value) OVER w, 6) AS avg_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-RANGE window frame (value-based, not row-based): per-user "
    "trailing 1-hour count/sum/avg where the frame is defined by the "
    "timestamp VALUE — irregular event spacing means ROWS frames cannot "
    "express it. Ordering key is epoch microseconds on both engines "
    "(events carry sub-second precision; a seconds cast would shift "
    "frame membership). Same single-shuffle shape as every per-user "
    "window: hash partition on user_id, per-partition sort, streaming "
    "frame evaluation — the frame bound adds zero extra exchanges.",
    tags=("window", "timeseries"),
)
def q_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return tbl(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        F.round(F.avg("value").over(w), 6).alias("avg_1h"),
    )


@register(
    "q_rolling_distinct",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
      FROM events),
    contrib AS (
      SELECT day + u.i * INTERVAL 1 DAY AS day, user_id
      FROM pairs, unnest(generate_series(0, 6)) AS u(i))
    SELECT c.day, count(DISTINCT c.user_id) AS wau
    FROM contrib c SEMI JOIN (SELECT DISTINCT day FROM pairs) d
      ON c.day = d.day
    GROUP BY 1
    """,
    doc="Trailing 7-day distinct active users per day (the WAU metric) — "
    "sliding-window COUNT(DISTINCT) that PARALLELIZES: a global "
    "RANGE-frame distinct would order the whole table on one timeline, "
    "so instead each distinct (user, day) activity emits the 7 window "
    "anchors it serves and one hash aggregate counts distinct users per "
    "anchor. Cost is a bounded 7x inflation of the (user, day) DEDUPED "
    "activity (tiny vs raw events), all shuffles are keyed and "
    "map-side-combined, and anchors beyond the observed days are "
    "semi-joined away. The approximate form at 100 TB swaps "
    "count_distinct for HLL sketches merged across days.",
    tags=("window", "timeseries", "aggregate"),
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        tbl(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    contrib = pairs.select(
        F.explode(
            F.expr(
                "sequence(day, day + make_interval(0,0,0,6),"
                " make_interval(0,0,0,1))"
            )
        ).alias("day"),
        "user_id",
    )
    active_days = pairs.select("day").distinct()
    return (
        contrib.join(active_days, "day", "semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
