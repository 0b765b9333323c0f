"""Multimodal declared queries (rows-only: the codec is a deterministic
stub, so there is no SQL oracle — the driver records the weaker check).

The media table is synthesized from `documents` (text bytes as the opaque
payload) so the Arrow-batch mapInPandas plumbing runs against real testdata
at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.multimodal import (
    decode_images,
    plan_audio_windows,
    sample_video_frames,
)
from endtoend_etl_openmeteo_spark.plans.registry import register
from endtoend_etl_openmeteo_spark.sources.tables import tbl


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 4 == 0, "video")
        .when(F.col("doc_id") % 4 == 1, "audio")
        .otherwise("image")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.when(kind == "audio", "audio/wav")
            .when(kind == "video", "video/mp4")
            .otherwise("image/png")
            .alias("mime"),
            (F.col("n_chars") % 1024).cast("int").alias("width"),
            (F.col("n_chars") % 768).cast("int").alias("height"),
            (F.col("n_chars") / 100.0).alias("duration_s"),
            F.when(kind == "audio", 16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


@register(
    "q_multimodal_features",
    # The fake codec is deterministic (sha256 of the payload bytes), so the
    # scalar feature columns ARE oracle-checkable: DuckDB's sha256()/strlen()
    # hash/measure the same UTF-8 bytes Spark's encode() produces.
    oracle="""
        SELECT doc_id AS media_id,
               strlen(text)::BIGINT AS n_bytes,
               sha256(text) AS sha256,
               (n_chars % 1024)::BIGINT AS width,
               (n_chars % 768)::BIGINT AS height
        FROM documents
        WHERE doc_id % 4 NOT IN (0, 1)
    """,
    doc="Binary-column feature extraction via Arrow-batched mapInPandas "
    "(SURVEY §7 step 7 multimodal): opaque payload → per-item digest. The "
    "decode seam is stubbed; schema, batching and partitioning are the real "
    "100 TB plumbing. Scalar outputs only, so the driver hash-checks it; "
    "the embedding-array variant is q_multimodal_embedding (rows-only).",
    tags=("multimodal", "pandas-udf"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = decode_images(_media_from_documents(spark, sf_dir))
    return feats.select(
        "media_id",
        "n_bytes",
        "sha256",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


@register(
    "q_multimodal_embedding",
    # The fake encoder is pure integer arithmetic on sha256 chunks:
    # element i = digest[4i..4i+4] as a big-endian uint32, scaled to
    # [-0.5, 0.5). Every step is exact in IEEE double and the final
    # float32 narrowing is replicated with ::REAL, so the oracle matches
    # BIT-FOR-BIT — no rounding slack hiding a broken pipeline.
    oracle="""
    SELECT doc_id AS media_id,
           """
    + ",\n           ".join(
        f"((('0x' || substr(sha256(text), {i * 8 + 1}, 8))::BIGINT"
        f" / 4294967296.0 - 0.5)::REAL) AS e{i}"
        for i in range(8)
    )
    + """
    FROM documents
    WHERE doc_id % 4 NOT IN (0, 1)
    """,
    doc="Deterministic fake-encoder embedding, element-wise hash-checked: "
    "the mapInPandas Arrow path produces the array column, and each "
    "element is compared exactly against DuckDB's recomputation from the "
    "same sha256 bytes (uint32 chunk / 2^32 - 0.5, float32-narrowed on "
    "both engines). Exercises the full vectorized feature path including "
    "array construction and per-element extraction.",
    tags=("multimodal", "pandas-udf"),
)
def q_multimodal_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = decode_images(_media_from_documents(spark, sf_dir))
    return feats.select(
        "media_id",
        *[F.element_at("embedding", i + 1).alias(f"e{i}") for i in range(8)],
    )


@register(
    "q_multimodal_video",
    # The video slice of the synthesized media table through the
    # decode_videos Arrow seam (fake codec): every scalar output is
    # deterministic from the payload bytes / typed metadata, so DuckDB
    # replays it exactly — same discipline as q_multimodal_features.
    oracle="""
        SELECT doc_id AS media_id,
               strlen(text)::BIGINT AS n_bytes,
               sha256(text) AS sha256,
               (n_chars % 1024)::BIGINT AS width,
               (n_chars % 768)::BIGINT AS height,
               round(n_chars / 100.0, 6) AS duration_s
        FROM documents
        WHERE doc_id % 4 = 0
    """,
    doc="Video-column probe via Arrow-batched mapInPandas "
    "(operators/multimodal.decode_videos): opaque payload digest + typed "
    "container metadata (geometry, duration). decode='real' parses "
    "ISO-BMFF box trees (mvhd duration, 16.16 tkhd geometry — "
    "tests/test_multimodal.py); the declared query runs the fake codec "
    "so the whole row is hash-checked. Completes the per-modality seam "
    "trio: images (q_multimodal_features), audio (q_multimodal_audio), "
    "video here — one partitioning/batching discipline for all three.",
    tags=("multimodal", "pandas-udf"),
)
def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.multimodal import decode_videos

    feats = decode_videos(_media_from_documents(spark, sf_dir))
    return feats.select(
        "media_id",
        "n_bytes",
        "sha256",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.round("duration_s", 6).alias("duration_s"),
    )


@register(
    "q_multimodal_frames",
    # Pure metadata arithmetic — fully SQL-expressible: one row per sampled
    # frame at 1 fps, at least one frame per video.
    oracle="""
        WITH v AS (
            SELECT doc_id AS media_id,
                   greatest(floor((n_chars / CAST(100.0 AS DOUBLE))
                                  * CAST(1.0 AS DOUBLE))::INT, 1) AS n_frames
            FROM documents
            WHERE doc_id % 4 = 0
        ), e AS (
            SELECT media_id,
                   unnest(generate_series(0, n_frames - 1)) AS i
            FROM v
        )
        SELECT media_id,
               i::BIGINT AS frame_idx,
               i / CAST(1.0 AS DOUBLE) AS frame_ts_s
        FROM e
    """,
    doc="Video frame-sampling plan (1 fps) from typed metadata — JVM-side "
    "sequence arithmetic, payload bytes never touched.",
    tags=("multimodal",),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_video_frames(_media_from_documents(spark, sf_dir), fps=1.0)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "frame_ts_s",
    )


@register(
    "q_multimodal_audio",
    # Window/hop arithmetic over (duration_s, sample_rate) metadata; windows
    # tile at 2.5 s stride, final window truncates at the media end.
    oracle="""
        WITH a AS (
            SELECT doc_id AS media_id,
                   n_chars / CAST(100.0 AS DOUBLE) AS duration_s,
                   16000 AS sample_rate
            FROM documents
            WHERE doc_id % 4 = 1
        ), e AS (
            SELECT media_id, duration_s, sample_rate,
                   unnest(generate_series(
                       0,
                       greatest(ceil((duration_s - CAST(5.0 AS DOUBLE))
                                     / CAST(2.5 AS DOUBLE))::INT, 0)
                   )) AS i
            FROM a
        )
        SELECT media_id,
               i::BIGINT AS win_idx,
               i * CAST(2.5 AS DOUBLE) AS start_s,
               least(i * CAST(2.5 AS DOUBLE) + CAST(5.0 AS DOUBLE),
                     duration_s) AS end_s,
               round((least(i * CAST(2.5 AS DOUBLE) + CAST(5.0 AS DOUBLE),
                            duration_s)
                      - i * CAST(2.5 AS DOUBLE)) * sample_rate)::BIGINT
                   AS n_samples
        FROM e
    """,
    doc="Audio analysis-window plan (5 s window, 2.5 s hop) from typed "
    "metadata — the STFT/encoder front-end shape; JVM-side window "
    "arithmetic, payload bytes never touched.",
    tags=("multimodal",),
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    wins = plan_audio_windows(
        _media_from_documents(spark, sf_dir), window_s=5.0, hop_s=2.5
    )
    return wins.select(
        "media_id",
        F.col("win_idx").cast("long").alias("win_idx"),
        "start_s",
        "end_s",
        "n_samples",
    )
