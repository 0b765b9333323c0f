"""Keyed upsert/merge on plain Parquet (SURVEY.md §4 custom-work item 1).

The reference's ``INSERT ... ON CONFLICT (city,"timestamp") DO UPDATE``
(``ingestion/loader/load_to_postgres.py:89-102``) gives last-write-wins per
key. OSS Spark without a table format has no MERGE INTO, so the engine
provides it as a library operator:

    union(affected target partitions, new batch)
      → row_number() over key ordered by order_col desc → keep first
      → dynamic partition overwrite

Scale design (the part that must survive 100 TB):
- **Partition-scoped, never full-table.** Only partitions present in the
  new batch are read back and rewritten; a 24-row hourly batch against a
  100 TB table touches a handful of partitions. The partition values of the
  batch are collected (small by construction — a batch's distinct partition
  keys) and pushed as an IN filter so partition pruning limits the
  read-back.
- The dedup window shuffles on the merge keys only — no global sort.
- ``partitionOverwriteMode=dynamic`` makes the final write replace exactly
  the touched partitions atomically-per-partition.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dedup_last_write_wins(
    df: DataFrame, keys: list[str], order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the newest row per key. ``tiebreak_cols`` (descending, after
    ``order_col``) make equal-``order_col`` conflicts deterministic —
    merge_upsert passes a source tag so a re-ingested correction carrying
    the SAME order value as the stored row still wins (ON CONFLICT DO
    UPDATE semantics); without one, equal-order ties fall to Spark's
    unstable sort."""
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Quiet existence check through Hadoop's FileSystem (a speculative
    spark.read would log a full FileNotFoundException stack on first run)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _delete_path(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def _stage_and_reread(
    spark: SparkSession, df: DataFrame, base_path: str
) -> tuple[DataFrame, str]:
    """Materialize ``df`` to a staging dir beside ``base_path`` and re-read.

    Needed before dynamic-partition-overwriting files the plan itself reads.
    localCheckpoint would be cheaper but stores UNREPLICATED executor-local
    blocks: on a real cluster an executor loss mid-write truncates lineage
    and fails the merge unrecoverably. The staging copy lives on the same
    durable filesystem (HDFS/S3) as the target, so it survives executor
    loss; caller deletes it after the final write commits.
    """
    staging = base_path.rstrip("/") + f"__stage_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    return spark.read.parquet(staging), staging


def merge_upsert(
    spark: SparkSession,
    new: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Last-write-wins merge of ``new`` into the Parquet table at
    ``target_path`` keyed by ``keys``, newest-by-``order_col`` winning —
    the reference's upsert semantics (S8/J4/T4).

    Idempotent: re-merging the same batch leaves the table unchanged.
    An EMPTY batch is a no-op — without the early return it would fall
    through to ``affected = target`` (no partition predicate) and
    stage + rewrite the ENTIRE table to change nothing, paying a
    full-table copy and exposing every partition to the overwrite
    window (a quarantine gate that rejects a whole micro-batch hits
    exactly this).
    """
    partition_cols = partition_cols or []

    exists = _path_exists(spark, target_path)
    if exists:
        target = spark.read.parquet(target_path)

    if exists:
        if partition_cols:
            # Partition-scoped read-back: only partitions the batch touches.
            # eqNullSafe, not ==: a plain equality against a NULL partition
            # value never matches, the null partition's existing rows are
            # excluded from `affected`, and the dynamic overwrite would
            # replace the whole __HIVE_DEFAULT_PARTITION__ with batch rows
            # only — silent deletion of every pre-existing key there.
            batch_parts = new.select(*partition_cols).distinct().collect()
            if not batch_parts:
                return  # empty batch: nothing to merge, nothing to touch
            pred = None
            for row in batch_parts:
                clause = None
                for c in partition_cols:
                    eq = F.col(c).eqNullSafe(F.lit(row[c]))
                    clause = eq if clause is None else (clause & eq)
                pred = clause if pred is None else (pred | clause)
            affected = target.filter(pred) if pred is not None else target
        else:
            if new.isEmpty():
                return  # empty batch: a full-table rewrite would be a no-op
            affected = target
        # source tag: on an exact order_col tie the BATCH row must win
        # (the reference's ON CONFLICT DO UPDATE always takes the new row)
        merged = dedup_last_write_wins(
            affected.withColumn("__src", F.lit(0)).unionByName(
                new.select(*affected.columns).withColumn("__src", F.lit(1))
            ),
            keys,
            order_col,
            tiebreak_cols=["__src"],
        ).drop("__src")
    else:
        merged = dedup_last_write_wins(new, keys, order_col)

    # Dynamic overwrite rewrites only the partitions present in `merged`
    # (engine conf partitionOverwriteMode=dynamic); when the target already
    # exists the DataFrame must be materialized durably first — it reads the
    # very files the write will replace.
    staging = None
    if exists:
        merged, staging = _stage_and_reread(spark, merged, target_path)
    # Pin dynamic overwrite for THIS write instead of trusting the ambient
    # session conf: under Spark's static default, overwrite+partitionBy
    # deletes every partition NOT in the batch — near-total data loss from
    # a one-partition merge (the index_maintain set-and-restore pattern).
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        if partition_cols:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        writer = merged.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        if staging is not None:
            _delete_path(spark, staging)


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Partial-aggregate state for incremental materialized-view
    maintenance: (keys..., __n, __sum, __min, __max) per group.

    The algebraic-aggregate half of the mergeable-rollup family
    (plans/sketches.py holds the sketch half): count/sum/min/max
    decompose over any partition of the input, so a stored mart can be
    maintained by aggregating ONLY each arriving batch and merging the
    batch state in — never rescanning history. avg/stddev derive from
    the state at finalize time; non-decomposable stats (distinct,
    quantiles) are the sketches' job.
    """
    return df.groupBy(*keys).agg(
        F.count("*").alias("__n"),
        F.sum(value_col).alias("__sum"),
        F.min(value_col).alias("__min"),
        F.max(value_col).alias("__max"),
    )


def merge_agg_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge any number of agg_state frames: union + one re-aggregate
    with each component's merge function (count→sum, sum→sum, min→min,
    max→max). Associative and commutative — batches can arrive in any
    order, states of states merge identically."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys).agg(
        F.sum("__n").alias("__n"),
        F.sum("__sum").alias("__sum"),
        F.min("__min").alias("__min"),
        F.max("__max").alias("__max"),
    )


def finalize_agg_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """The user-facing mart from a state frame. Rounding per repo oracle
    convention (sum 4dp — cross-engine/merge-order summation differs at
    ~1e-10 — avg/min/max 6dp); avg derives as sum/count so the formula
    matches what any SQL engine recomputing from raw rows produces."""
    return state.select(
        *keys,
        F.col("__n").alias("n_events"),
        F.round(F.col("__sum"), 4).alias("sum_value"),
        F.round(F.col("__sum") / F.col("__n"), 6).alias("avg_value"),
        F.round(F.col("__min"), 6).alias("min_value"),
        F.round(F.col("__max"), 6).alias("max_value"),
    )
