"""Physical-plan quality gates (the 100 TB design checks, SURVEY.md §4).

These assert the plans Catalyst actually produces — pushdown reaching the
parquet scan, dimension joins going broadcast, top-k avoiding global sorts —
so a regression in plan shape fails CI even while results stay correct.
"""

import pytest

from endtoend_etl_openmeteo_spark import plans

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def registry():
    return plans.load_all()


def test_scan_pushes_filter_and_prunes_columns(spark, registry):
    plan = _physical(registry["q_scan"].fn(spark, SF))
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)" in plan
    # only the 4 projected columns reach the reader
    assert "l_extendedprice" in plan and "l_returnflag" not in plan


def test_range_filter_pushes_timestamp_bounds(spark, registry):
    """The ns-long filter (not the derived timestamp) reaches the reader."""
    plan = _physical(registry["q_range_filter"].fn(spark, SF))
    assert "GreaterThanOrEqual(ts" in plan.split("PushedFilters")[1].split("]")[0]


def test_dim_joins_are_broadcast(spark, registry):
    for q in ("q_broadcast_join", "q_semi_join", "q_anti_join"):
        plan = _physical(registry[q].fn(spark, SF))
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, q
        assert "SortMergeJoin" not in plan, q


def test_top1_uses_take_ordered_not_global_sort(spark, registry):
    plan = _physical(registry["q_top1"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_aggregates_have_partial_stage(spark, registry):
    """Map-side partial aggregation before the shuffle (HashAggregate x2)."""
    plan = _physical(registry["q_daily_agg"].fn(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "partial_avg" in plan or "partial_" in plan


def test_whole_stage_codegen_covers_hot_path(spark, registry):
    df = registry["q_daily_agg_full"].fn(spark, SF)
    df.collect()  # AQE finalizes the plan (codegen spans appear post-exec)
    plan = _physical(df)
    # '*(n)' prefixes mark WholeStageCodegen spans in the plan string;
    # both the partial and final aggregate stages must be inside one.
    assert "isFinalPlan=true" in plan
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan


#: The complete Python-on-executor allowlist. Policy: NO row-at-a-time
#: Python UDFs anywhere (BatchEvalPython/ArrowEvalPython); vectorized
#: Arrow-batch operators (MapInPandas/FlatMapGroupsInPandas) ONLY in the
#: queries below, where JVM built-ins genuinely can't express the op:
#: the multimodal codec seam and the LSH bucketed-matmul candidate path.
VECTORIZED_PYTHON_ALLOWED = frozenset(
    {
        "q_multimodal_features",  # codec seam (operators/multimodal.py)
        "q_multimodal_embedding",
        "q_ann_lsh",  # hyperplane-projection matmul (operators/similarity.py)
        "q_ann_recall_contract",  # composes q_ann_lsh, inherits its seam
    }
)


def test_no_python_udfs_in_reference_parity_queries(spark, registry):
    """SURVEY §2.10: reference parity needs zero Python UDFs — everything
    stays in Tungsten. Row-at-a-time Python is banned everywhere; Arrow
    vectorized operators are allowed only in VECTORIZED_PYTHON_ALLOWED."""
    for name, spec in registry.items():
        plan = _physical(spec.fn(spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        if name not in VECTORIZED_PYTHON_ALLOWED:
            assert "MapInPandas" not in plan, name
            assert "FlatMapGroupsInPandas" not in plan, name


def test_pq_encode_is_map_only_with_broadcast_codebook(spark):
    """PQ encoding must scan the corpus exactly once with no key-based
    shuffle: codebooks ride a one-row broadcast (the 100 TB claim — codes
    are produced by a narrow pass, raw vectors never shuffle)."""
    from endtoend_etl_openmeteo_spark.operators.similarity import pq_encode, pq_train
    from endtoend_etl_openmeteo_spark.sources.tables import tbl

    emb = tbl(spark, SF, "embeddings")
    cb = pq_train(emb, m=8, k=16, iterations=1)
    plan = _physical(pq_encode(emb, cb))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # Any hash exchange may only touch the m*k-row codebook aggregation
    # (keyed on `block`); the corpus side is round-robin spread only.
    assert plan.count("hashpartitioning") == plan.count("hashpartitioning(block")
    assert "RoundRobinPartitioning" in plan


def test_single_exchange_aggregate_shapes(spark, registry):
    """q_ohlc (min_by/max_by keyed candlesticks), q_twap (lead window +
    aggregate sharing one (event_type, day) partitioning), and
    q_json_extract (map-side JSON parse) must each move the fact stream
    through exactly ONE exchange, with map-side partial aggregation."""
    for q in ("q_ohlc", "q_twap", "q_json_extract"):
        plan = _physical(registry[q].fn(spark, SF))
        assert plan.count("Exchange") == 1, (q, plan.count("Exchange"))
        assert "partial_" in plan, q


def test_dpp_join_prunes_fact_partitions_at_runtime(spark, registry):
    """q_dpp_join's fact scan must carry a dynamicpruningexpression fed by
    the dim broadcast: the partition list is cut to the join-key values
    surviving the dim filter AT EXECUTION TIME — the star-schema scan
    reduction static pushdown cannot express (the pruning values live in
    another table)."""
    plan = _physical(registry["q_dpp_join"].fn(spark, SF))
    scan = plan.split("PartitionFilters")[1]
    assert "dynamicpruningexpression" in scan.split("]")[0]
    # pruning reuses the dim broadcast, not a second dim scan
    assert "SubqueryAdaptiveBroadcast" in plan or "SubqueryBroadcast" in plan


def test_gap_detect_broadcasts_expected_side(spark, registry):
    """The tiny (keys x hours) expected series must broadcast — the fact
    scan never shuffles for the anti-join."""
    plan = _physical(registry["q_gap_detect"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_parity_queries_fit_in_driver_checked_prefix():
    """The driver verifies only a prefix of queries() (50 entries in round
    1); every SURVEY §2 parity query must sit inside it, orderly, so the
    hard correctness signal always covers the reference core first."""
    ordered = list(plans.ordered_registry())
    parity = [
        "q_range_filter", "q_tz_filter", "q_daily_agg", "q_daily_agg_full",
        "q_sequence", "q_gap_detect", "q_upsert",
        "q_scan", "q_cast_projection", "q_round", "q_sort", "q_top1",
        "q_limit", "q_distinct", "q_union", "q_coalesce", "q_string_ops",
        "q_date_format", "q_json_roundtrip",
        "q_broadcast_join", "q_semi_join", "q_anti_join",
        "q_dq_nulls", "q_dq_bounds", "q_dq_gate",
        "q_explode", "q_explode_nullpad",
        "q_multimodal_features", "q_multimodal_frames",
    ]
    prefix = set(ordered[:50])
    missing = [q for q in parity if q not in prefix]
    assert not missing, f"parity queries outside driver-checked prefix: {missing}"
    # every PRIORITY name must actually exist (catches typos/renames)
    reg = plans.load_all()
    unknown = [q for q in plans.PRIORITY if q not in reg]
    assert not unknown, f"PRIORITY names not in registry: {unknown}"


def test_contamination_broadcasts_benchmark_set(spark, registry):
    """The benchmark shingle set is corpus-size-independent (an eval suite)
    — it must broadcast so candidate shingles never shuffle for the probe."""
    plan = _physical(registry["q_contamination"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_winsorize_broadcasts_group_stats(spark, registry):
    """Per-lang p05/p95 is |langs| rows at any scale; the clip join must
    broadcast, never sort-merge the corpus."""
    plan = _physical(registry["q_winsorize"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_map_only_llm_stages_have_no_shuffle(spark, registry):
    """PII scrub and context chunking are per-row stages — any Exchange in
    their plan is a regression (at 100 TB it would shuffle the corpus)."""
    for q in ("q_pii_scrub", "q_chunk_windows"):
        plan = _physical(registry[q].fn(spark, SF))
        assert "Exchange" not in plan, q


def test_pack_sequences_single_shuffle(spark, registry):
    """Packing is one window cumsum per bin: exactly one hash-partitioning
    exchange on the bin key."""
    plan = _physical(registry["q_pack_sequences"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_windows_share_one_exchange(spark, registry):
    """Three stacked per-user window minima must reuse a single user_id
    hash exchange — a per-step self-join would shuffle three times."""
    plan = _physical(registry["q_funnel"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 3


def test_range_window_single_exchange(spark, registry):
    """The time-RANGE frame evaluates inside the one per-user window sort —
    the value-based bound must not add exchanges over a ROWS frame."""
    plan = _physical(registry["q_range_window"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_lm_score_broadcasts_language_model(spark, registry):
    """The unigram LM table is vocabulary-sized, not corpus-sized — the
    scoring join must broadcast it so document tokens never shuffle."""
    df = registry["q_lm_score"].fn(spark, SF)
    df.collect()  # AQE finalizes join strategies
    plan = _physical(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_domain_cap_single_window_exchange(spark, registry):
    """Canonicalization is narrow; the cap is one row_number window on
    domain — exactly one hash exchange, no join, no global sort."""
    plan = _physical(registry["q_domain_cap"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_shard_pack_avoids_single_partition_window(spark, registry):
    """The distributed zipWithIndex must never funnel data through one
    task: every Exchange is hash/agg-keyed, no SinglePartition exchange,
    no global Sort — the per-bucket windows carry the ordering."""
    import re

    plan = _physical(registry["q_shard_pack"].fn(spark, SF))
    assert "Exchange SinglePartition" not in plan
    assert not re.search(r"Sort \[[^\]]*\], true", plan)  # no global sort
    assert "Window" in plan  # per-bucket row_number is the mechanism
