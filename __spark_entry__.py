"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``endtoend_etl_openmeteo_spark.plans`` — this
module is a thin adapter over the query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from endtoend_etl_openmeteo_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the daily mart (SURVEY §2.4 A1/A3) —
    full-stat daily aggregate per event_type, the fct_city_day analog."""
    registry = plans.load_all()
    return registry["q_daily_agg_full"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7 step 7,
    in driver-check priority order (parity core first — the driver verifies
    a prefix of this dict)."""
    return {name: spec.fn for name, spec in plans.ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for approximate /
    hash-specific operators, which get the driver's rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in plans.ordered_registry().items()
        if spec.oracle is not None
    }
