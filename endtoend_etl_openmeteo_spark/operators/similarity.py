"""Similarity search over embedding columns (SURVEY.md §7 step 7).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed variant
(random-hyperplane signs) as the scale path. Everything is built-in array
ops (`zip_with`/`aggregate`) — JVM-side, no Python in the hot loop.

Scale design: queries are broadcast (a query batch is small by definition);
the corpus never shuffles for brute force — each partition scores its rows
against the broadcast queries and TakeOrderedAndProject / per-query window
keeps k. The LSH variant buckets the corpus by hyperplane sign bits so only
matching buckets are scored (recall < 1, tunable via bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, left-to-right sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k: (q_id, n_id, cos_sim, rank).

    Similarity is rounded to 6dp BEFORE ranking so rank order is stable
    across engines/partitionings; ties break on neighbor id.
    """
    from pyspark.sql import Window

    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    c = cpu_parallelize(corpus).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).cast("array<double>").alias("n_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a counter hash.

    Pure-python xorshift on (plane, dim-index) — reproducible without numpy
    state, so the plan is the same on every executor.
    """
    vals = []
    for d in range(dim):
        x = (plane * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & (
            2**64 - 1
        )
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        x ^= x >> 27
        vals.append(((x & 0xFFFF) / 32768.0) - 1.0)  # [-1, 1)
    return vals


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    k: int = 10,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane sign bucket, score within
    bucket only. Recall is tunable via n_planes (fewer planes = bigger
    buckets = higher recall, more compute)."""
    from pyspark.sql import Window

    def bucket_bits(vec: Column) -> Column:
        bits = F.lit(0).cast("long")
        for p in range(n_planes):
            plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
            bits = bits.bitwiseOR(
                F.when(dot(vec, plane) > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
            )
        return bits

    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    ).withColumn("bucket", bucket_bits(F.col("q_vec")))
    c = cpu_parallelize(corpus).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).cast("array<double>").alias("n_vec")
    ).withColumn("bucket", bucket_bits(F.col("n_vec")))

    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
