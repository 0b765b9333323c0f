"""Query registry plumbing.

A query is ``fn(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB oracle string over the same parquet tables. Column names are the
contract: the driver's compare sorts columns by name before hashing, so every
computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from endtoend_etl_openmeteo_spark.session import ensure_engine_conf

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. Applies engine runtime conf (UTC session
    timezone above all) before running, so semantics don't depend on who
    created the SparkSession."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco
