"""Data-quality queries (SURVEY.md §2.4 A4/A5, §2.9 T6, §2.11).

The DQ gate compiles a declarative expectation suite into ONE aggregate scan
(operators/dq.py) — the Spark-first form of the reference's Great
Expectations suite (ge/validate_raw_weather.py:139-189).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.dq import Expectation, compile_expectations
from endtoend_etl_openmeteo_spark.plans.registry import register
from endtoend_etl_openmeteo_spark.sources.tables import tbl


@register(
    "q_dq_nulls",
    oracle="""
    SELECT count(*) AS n_rows,
           count(*) - count(ts) AS null_ts,
           count(*) - count(user_id) AS null_user_id,
           count(*) - count(event_type) AS null_event_type,
           count(*) - count(value) AS null_value,
           count(*) - count(props) AS null_props
    FROM events
    """,
    doc="Null-count validation aggregates (SURVEY §2.4 A4) — the five "
    "not_null expectations of ge/validate_raw_weather.py:143-153, all in "
    "one aggregate pass.",
    tags=("dq", "aggregate"),
)
def q_dq_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    return ev.agg(
        n.alias("n_rows"),
        (n - F.count("ts")).alias("null_ts"),
        (n - F.count("user_id")).alias("null_user_id"),
        (n - F.count("event_type")).alias("null_event_type"),
        (n - F.count("value")).alias("null_value"),
        (n - F.count("props")).alias("null_props"),
    )


@register(
    "q_dq_bounds",
    oracle="""
    SELECT count(*) AS n_rows,
           count(*) FILTER (WHERE NOT (l_quantity BETWEEN 1 AND 50)) AS viol_quantity,
           count(*) FILTER (WHERE NOT (l_discount BETWEEN 0.0 AND 0.1)) AS viol_discount,
           count(*) FILTER (WHERE NOT (l_tax BETWEEN 0.0 AND 0.08)) AS viol_tax,
           count(*) FILTER (WHERE NOT (l_extendedprice BETWEEN 0.0 AND 100000.0))
             AS viol_price
    FROM lineitem
    """,
    doc="Range-violation counts (SURVEY §2.4 A5) — the between expectations "
    "of ge/validate_raw_weather.py:154-168. NULL NOT BETWEEN is null → "
    "not counted, matching GE's null-ignoring bounds semantics (§2.11).",
    tags=("dq", "aggregate"),
)
def q_dq_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")

    def viol(col: str, lo: float, hi: float) -> F.Column:
        return F.count(F.when(~F.col(col).between(lo, hi), 1))

    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        viol("l_quantity", 1, 50).alias("viol_quantity"),
        viol("l_discount", 0.0, 0.1).alias("viol_discount"),
        viol("l_tax", 0.0, 0.08).alias("viol_tax"),
        viol("l_extendedprice", 0.0, 100000.0).alias("viol_price"),
    )


#: Suite for q_dq_gate over events — all pass on the synthetic data, so the
#: gate result itself (passed flags) is deterministic and oracle-checkable.
_EVENTS_SUITE = [
    Expectation("not_null", "ts"),
    Expectation("not_null", "event_type"),
    Expectation("not_null", "user_id"),
    Expectation("between", "value", lo=-1e6, hi=1e6, mostly=1.0),
    Expectation(
        "in_set",
        "event_type",
        values=("click", "error", "purchase", "signup", "view"),
    ),
]


@register(
    "q_dq_gate",
    oracle="""
    WITH m AS (
      SELECT count(*) AS n_rows,
             count(*) - count(ts) AS v0,
             count(*) - count(event_type) AS v1,
             count(*) - count(user_id) AS v2,
             count(*) FILTER (WHERE NOT (value BETWEEN -1e6 AND 1e6)) AS v3,
             count(*) FILTER (
               WHERE event_type NOT IN ('click','error','purchase','signup','view')
             ) AS v4
      FROM events
    )
    SELECT u.expectation, u.col_name, u.violations, m.n_rows,
           (u.violations::DOUBLE / greatest(m.n_rows, 1)) <= 0.0 AS passed
    FROM m, (
      SELECT 'not_null_ts' AS expectation, 'ts' AS col_name, v0 AS violations FROM m
      UNION ALL SELECT 'not_null_event_type', 'event_type', v1 FROM m
      UNION ALL SELECT 'not_null_user_id', 'user_id', v2 FROM m
      UNION ALL SELECT 'between_value_-1000000.0_1000000.0', 'value', v3 FROM m
      UNION ALL SELECT 'in_set_event_type', 'event_type', v4 FROM m
    ) u
    """,
    doc="The full DQ gate (SURVEY §2.9 T6, §2.11): expectation suite "
    "compiled to one aggregate pass; long-format per-expectation result "
    "with mostly-threshold pass flags. The raising wrapper is "
    "operators.dq.dq_gate.",
    tags=("dq",),
)
def q_dq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compile_expectations(tbl(spark, sf_dir, "events"), _EVENTS_SUITE)
