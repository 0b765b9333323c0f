"""Mergeable-sketch rollups (Apache DataSketches built into Spark 3.5+).

THE 100 TB pre-aggregation pattern: distinct counts and quantiles don't
decompose over partial aggregates, so a dashboard asking "unique users for
any date range" either rescans raw events per query or stores per-day
SKETCHES and merges the requested days — constant work per query,
sketch-sized storage. HLL (distinct), KLL (quantiles) and Theta (set
algebra: intersection/difference of distinct sets — the one HLL can't do)
are all built-in JVM aggregates with binary, mergeable state.

Verification uses the repo's error-bound contract (same as q_approx_stats):
sketch estimates are implementation-specific, so the hash-checked columns
are exact anchors plus booleans asserting each estimate sits inside its
published tolerance, with an always-TRUE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.plans.registry import register
from endtoend_etl_openmeteo_spark.sources.tables import tbl


def _daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-rollup stage: one sketch row per (event_type, day).
    In production this materializes once per day; every later range query
    merges sketch rows instead of rescanning events."""
    return (
        tbl(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.hll_sketch_agg("user_id").alias("hll"),
            F.kll_sketch_agg_double("value").alias("kll"),
            F.theta_sketch_agg("user_id").alias("theta"),
        )
    )


@register(
    "q_sketch_rollup",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n,
           count(DISTINCT user_id)::BIGINT AS exact_users,
           TRUE AS hll_within_15pct,
           TRUE AS p50_within_iqr
    FROM events GROUP BY event_type
    """,
    doc="Daily HLL/KLL sketches merged across the full range "
    "(hll_union_agg / kll_merge_agg): the pre-aggregated rollup answering "
    "distinct-user and quantile questions for ANY date range without "
    "rescanning raw events. Hash-checked contract: merged-HLL estimate "
    "within 15% of exact distinct, merged-KLL median inside the exact "
    "IQR; exact count + distinct ride along as anchors.",
    tags=("aggregate", "approx", "sketch"),
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged = _daily_sketches(spark, sf_dir).groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("hll_users"),
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("kll"), F.lit(0.5)
        ).alias("kll_p50"),
    )
    exact = (
        tbl(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("exact_users"),
            F.percentile("value", 0.25).alias("p25"),
            F.percentile("value", 0.75).alias("p75"),
        )
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n",
        "exact_users",
        (
            F.abs(F.col("hll_users") - F.col("exact_users"))
            <= 0.15 * F.col("exact_users")
        ).alias("hll_within_15pct"),
        (
            (F.col("kll_p50") >= F.col("p25")) & (F.col("kll_p50") <= F.col("p75"))
        ).alias("p50_within_iqr"),
    )


@register(
    "q_sketch_intersection",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT count(*) FROM c)::BIGINT AS click_users,
           (SELECT count(*) FROM p)::BIGINT AS purchase_users,
           (SELECT count(*) FROM c WHERE user_id IN (SELECT user_id FROM p)
           )::BIGINT AS exact_both,
           TRUE AS theta_inter_within_15pct,
           TRUE AS theta_diff_within_15pct
    """,
    doc="Theta-sketch set algebra: |click ∩ purchase| and |click \\\\ "
    "purchase| estimated by intersecting/differencing per-type sketches — "
    "the distinct-set question HLL cannot answer and exact computation "
    "needs a full dedup-join for. Sketches merge from the same daily "
    "rollup rows as q_sketch_rollup. Hash-checked contract: both "
    "estimates within 15% of exact, exact cardinalities as anchors.",
    tags=("aggregate", "approx", "sketch"),
)
def q_sketch_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_sketches(spark, sf_dir)
    # ONE global aggregate with conditional unions, never two filtered
    # one-row frames: a corpus slice with zero 'purchase' events would
    # make the filtered frame EMPTY and the cross join emit 0 rows,
    # while the oracle's scalar-subquery shape always returns one row —
    # aggregates over an empty/all-null input still emit their row, and
    # the missing side's null estimate coalesces to 0.
    est = (
        daily.filter(F.col("event_type").isin("click", "purchase"))
        .agg(
            F.theta_union_agg(
                F.when(F.col("event_type") == "click", F.col("theta"))
            ).alias("sk_click"),
            F.theta_union_agg(
                F.when(F.col("event_type") == "purchase", F.col("theta"))
            ).alias("sk_purchase"),
        )
        .select(
            F.coalesce(
                F.theta_sketch_estimate(
                    F.theta_intersection("sk_click", "sk_purchase")
                ),
                F.lit(0.0),
            ).alias("est_both"),
            F.coalesce(
                F.theta_sketch_estimate(
                    F.theta_difference("sk_click", "sk_purchase")
                ),
                F.lit(0.0),
            ).alias("est_only_click"),
        )
    )
    ev = tbl(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    p = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = (
        c.join(p.withColumn("__p", F.lit(1)).select("user_id", "__p"), "user_id", "left")
        .agg(
            F.count("*").alias("click_users"),
            F.sum(F.when(F.col("__p").isNotNull(), 1).otherwise(0)).alias(
                "exact_both"
            ),
        )
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("purchase_users"))))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "click_users",
        "purchase_users",
        F.col("exact_both").cast("long").alias("exact_both"),
        (
            F.abs(F.col("est_both") - F.col("exact_both"))
            <= 0.15 * F.greatest(F.col("exact_both"), F.lit(1))
        ).alias("theta_inter_within_15pct"),
        (
            F.abs(
                F.col("est_only_click")
                - (F.col("click_users") - F.col("exact_both"))
            )
            <= 0.15 * F.greatest(F.col("click_users") - F.col("exact_both"), F.lit(1))
        ).alias("theta_diff_within_15pct"),
    )


@register(
    "q_incremental_agg",
    # Full recompute straight from raw events — if the state algebra is
    # sound, three independently-aggregated batches merged together are
    # indistinguishable from one pass over everything.
    oracle="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*)::BIGINT AS n_events,
           round(sum(value), 4) AS sum_value,
           round(sum(value) / count(*), 6) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY 1, 2
    """,
    doc="Incremental materialized-view maintenance "
    "(operators/merge.agg_state/merge_agg_states/finalize_agg_state): "
    "the exact-aggregate half of the mergeable-rollup family. Three "
    "disjoint event batches are aggregated INDEPENDENTLY (as daily "
    "ingest would), their states merged associatively (count→sum, "
    "sum→sum, min→min, max→max), and the mart finalized from the merged "
    "state — hash-matched against one full recompute over raw events. "
    "At 100 TB this is the difference between 'new batch = aggregate "
    "batch + merge state' and 'new batch = rescan history'; the state "
    "frame is what you'd persist (e.g. in the versioned table format) "
    "between runs.",
    tags=("aggregate", "incremental", "mart"),
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.merge import (
        agg_state,
        finalize_agg_state,
        merge_agg_states,
    )

    ev = tbl(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "value",
        "event_id",
    )
    keys = ["event_type", "day"]
    batches = [
        agg_state(ev.filter(F.col("event_id") % 3 == i), keys, "value")
        for i in range(3)
    ]
    return finalize_agg_state(merge_agg_states(batches, keys), keys)


@register(
    "q_heavy_hitters",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                          ' ') AS ts
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] AS w
      FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
    ),
    sample_counts AS (
      SELECT w, count(*) AS n FROM bigrams
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
      GROUP BY w
    ),
    candidates AS (
      SELECT w FROM sample_counts
      WHERE n >= 0.001 * (SELECT sum(n) FROM sample_counts)
    ),
    exact AS (
      SELECT b.w, count(*) AS n
      FROM bigrams b JOIN candidates c ON b.w = c.w
      GROUP BY b.w
    )
    SELECT w, n FROM (
      SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rnk FROM exact
    ) WHERE rnk <= 20
    """,
    doc="Heavy hitters over the quadratic bigram space by sample-and-"
    "verify candidate pruning — the Misra-Gries/Space-Saving role played "
    "with deterministic, engine-portable parts. A 1/4 doc sample "
    "(content-independent md5 bucket, the q_train_split staple) nominates "
    "candidate bigrams above a relative frequency floor; only candidates "
    "are exactly counted over the full corpus, top-20 emitted. The scale "
    "property: the full-corpus exchange carries CANDIDATE keys only — "
    "non-candidates die in the map-side broadcast semi join — so shuffle "
    "volume is bounded by the (tiny) heavy-hitter set, not the key "
    "cardinality that makes an exact groupBy over n-gram/URL/user spaces "
    "infeasible at 100 TB. Guarantee (uniform sample): any key with true "
    "frequency well above the floor appears in the sample above it whp; "
    "borderline keys may be missed — the same one-sided contract "
    "MG/CMS-based heavy hitters give. All hash-checked: the md5 sample "
    "makes the pipeline exactly reproducible in DuckDB.",
    tags=("aggregate", "approx", "text"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        cpu_parallelize,
        normalized_text,
    )

    docs = cpu_parallelize(
        tbl(spark, sf_dir, "documents").select("doc_id", "text")
    )
    ts = F.split(normalized_text("text"), " ")
    toks = docs.select("doc_id", ts.alias("ts"))
    # guard the degenerate single-token/empty document: sequence(1, 0)
    # counts DOWN to [1, 0] in Spark, and element_at(ts, 0) / the
    # out-of-bounds index 2 both throw under the session's ANSI mode —
    # where DuckDB's generate_series(1, 0) is simply empty
    idx = F.when(
        F.size("ts") >= 2, F.sequence(F.lit(1), F.size("ts") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.element_at("ts", i), F.element_at("ts", i + 1)
                ),
            )
        ).alias("w"),
    )
    in_sample = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1", "2", "3")
    sample_counts = (
        bigrams.filter(in_sample).groupBy("w").agg(F.count("*").alias("n"))
    )
    total = sample_counts.agg(F.sum("n").alias("t"))
    candidates = (
        sample_counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") >= 0.001 * F.col("t"))
        .select("w")
    )
    exact = (
        bigrams.join(F.broadcast(candidates), "w")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    return exact.orderBy(F.desc("n"), "w").limit(20).select("w", "n")
