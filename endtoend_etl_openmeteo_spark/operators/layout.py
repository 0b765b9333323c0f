"""Physical-layout operators: bucketing and skew salting (SURVEY.md §4 —
the Spark equivalents of the reference's suggested `(city, timestamp)`
index, README.md:434-440 in /root/reference/).

- **Bucketing** pre-shuffles a table once at write time; every later join
  or aggregate on the bucket key is exchange-free. At 100 TB this converts
  the recurring fact⋈fact shuffle into a one-time write cost.
- **Salting** splits a hot key across `salt_factor` sub-keys so one
  pathological city/user doesn't serialize a whole stage. AQE's skew-join
  handles moderate skew automatically (engine conf); salting is the
  explicit tool for extreme single-key skew or for aggregations (which AQE
  skew handling does not cover).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table. Joins and
    aggregations on ``bucket_cols`` between tables bucketed the same way
    run without an Exchange."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def salted(df: DataFrame, distribute_by: str, salt_factor: int) -> DataFrame:
    """Add a deterministic ``__salt`` in [0, salt_factor) derived from a
    high-cardinality column (not rand(): reruns must land rows in the same
    sub-key for idempotent pipelines)."""
    return df.withColumn(
        "__salt", F.pmod(F.hash(F.col(distribute_by)), F.lit(salt_factor))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_factor: int = 8,
    distribute_by: str | None = None,
) -> DataFrame:
    """Equi-join resilient to a hot key on the skewed side.

    The skewed side gets a deterministic salt from ``distribute_by`` (any
    well-distributed column; defaults to the join key's companion row
    content via all columns is too wide — pick explicitly); the other side
    is replicated ``salt_factor``× with an exploded salt, then the join key
    becomes (key, salt). Row-for-row identical to the plain join.
    """
    dist = distribute_by or on
    left = salted(skewed, dist, salt_factor)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = left.join(right, [on, "__salt"])
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    agg_cols: dict[str, str],
    salt_factor: int = 8,
    distribute_by: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate on
    (keys, salt) spreads the hot key over ``salt_factor`` reducers, final
    aggregate merges the partials. Supports the decomposable aggregates
    (sum/count/min/max); avg callers compose sum/count.

    (AQE rebalances skewed JOINs but not skewed AGGREGATES — this is the
    tool for a groupBy where one key holds half the table.)
    """
    dist = distribute_by or group_cols[0]
    partial_aggs: list[Column] = []
    final_aggs: list[Column] = []
    for col, fn in agg_cols.items():
        if fn == "count":
            partial_aggs.append(F.count(col).alias(f"__p_{col}"))
            final_aggs.append(F.sum(f"__p_{col}").alias(f"count_{col}"))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(f"__p_{col}"))
            final_aggs.append(F.sum(f"__p_{col}").alias(f"sum_{col}"))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(f"__p_{col}"))
            final_aggs.append(F.min(f"__p_{col}").alias(f"min_{col}"))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(f"__p_{col}"))
            final_aggs.append(F.max(f"__p_{col}").alias(f"max_{col}"))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    partial = salted(df, dist, salt_factor).groupBy(*group_cols, "__salt").agg(
        *partial_aggs
    )
    return partial.groupBy(*group_cols).agg(*final_aggs)
