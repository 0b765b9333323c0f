"""Bloom-filter pruning operator (operators/bloom.py).

Pins the two properties the exactness argument rests on — zero false
negatives (every reference key probes true) and real pruning (the
false-positive rate on disjoint keys stays near the theoretical bound) —
plus the plan shape: the probe is a pure JVM-side filter, no join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.bloom import (
    bloom_build,
    bloom_collect,
    bloom_might_contain,
)


def test_no_false_negatives(spark):
    ref = spark.range(2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bits = bloom_collect(bloom_build(ref, "k"))
    hits = ref.filter(bloom_might_contain("k", bits)).count()
    assert hits == 2000  # every inserted key must probe true


def test_false_positive_rate_bounded(spark):
    ref = spark.range(2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    probe = spark.range(20000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    bits = bloom_collect(bloom_build(ref, "k"))
    fp = probe.filter(bloom_might_contain("k", bits)).count()
    # k=2, m=2^20, n=2000 -> p = (1-e^(-kn/m))^2 ~ 1.4e-5; give slack to 1%
    assert fp / 20000 < 0.01


def test_bitmap_is_dense_fixed_width(spark):
    ref = spark.range(10).select(F.col("id").cast("string").alias("k"))
    row = bloom_build(ref, "k", num_bits=4096).collect()
    assert len(row) == 1 and len(row[0]["__bloom_words"]) == 4096 // 64


def test_empty_reference_rejects_everything(spark):
    ref = spark.range(1).filter("id < 0").select(
        F.col("id").cast("string").alias("k")
    )
    probe = spark.range(100).select(F.col("id").cast("string").alias("k"))
    bits = bloom_collect(bloom_build(ref, "k", num_bits=4096))
    assert probe.filter(bloom_might_contain("k", bits, num_bits=4096)).count() == 0


def test_smaller_filter_still_exact_when_verified(spark):
    # Saturate a tiny filter: pruning degrades, exact verify join keeps
    # the composed result correct — the safety property under misconfig.
    ref = spark.range(500).select((F.col("id") * 3).cast("string").alias("k"))
    probe = spark.range(1500).select(F.col("id").cast("string").alias("k"))
    bits = bloom_collect(bloom_build(ref, "k", num_bits=256, num_hashes=2))
    survivors = probe.filter(
        bloom_might_contain("k", bits, num_bits=256, num_hashes=2)
    )
    exact = survivors.join(F.broadcast(ref), "k").count()
    truth = probe.join(ref, "k").count()
    assert exact == truth == 500


def test_probe_plan_is_a_pure_filter(spark):
    ref = spark.range(100).select(F.col("id").cast("string").alias("k"))
    probe = spark.range(100).select(F.col("id").cast("string").alias("k"))
    bits = bloom_collect(bloom_build(ref, "k"))
    plan = (
        probe.filter(bloom_might_contain("k", bits))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan  # literal bitmap, not a cross-joined row
