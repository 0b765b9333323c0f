"""Incremental materialized-view algebra (operators/merge.agg_state family).

The property the mart maintenance rests on: merging per-batch states is
indistinguishable from one aggregate over everything, for ANY batch
split and ANY merge grouping (associativity — states of states).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.merge import (
    agg_state,
    finalize_agg_state,
    merge_agg_states,
)

KEYS = ["k"]


def _rows(spark):
    return spark.range(1000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 1.5 - 250).alias("v"),
        "id",
    )


def _collect(df):
    return sorted((r["k"], tuple(r)[1:]) for r in df.collect())


def test_merged_batches_equal_full_recompute(spark):
    df = _rows(spark)
    full = finalize_agg_state(agg_state(df, KEYS, "v"), KEYS)
    batches = [
        agg_state(df.filter(F.col("id") % 3 == i), KEYS, "v") for i in range(3)
    ]
    merged = finalize_agg_state(merge_agg_states(batches, KEYS), KEYS)
    assert _collect(merged) == _collect(full)


def test_merge_is_associative_over_states_of_states(spark):
    df = _rows(spark)
    parts = [
        agg_state(df.filter(F.col("id") % 4 == i), KEYS, "v") for i in range(4)
    ]
    left_heavy = merge_agg_states(
        [merge_agg_states(parts[:3], KEYS), parts[3]], KEYS
    )
    right_heavy = merge_agg_states(
        [parts[0], merge_agg_states(parts[1:], KEYS)], KEYS
    )
    assert _collect(finalize_agg_state(left_heavy, KEYS)) == _collect(
        finalize_agg_state(right_heavy, KEYS)
    )


def test_empty_batch_is_identity(spark):
    df = _rows(spark)
    state = agg_state(df, KEYS, "v")
    empty = agg_state(df.filter(F.lit(False)), KEYS, "v")
    merged = merge_agg_states([state, empty], KEYS)
    assert _collect(finalize_agg_state(merged, KEYS)) == _collect(
        finalize_agg_state(state, KEYS)
    )
