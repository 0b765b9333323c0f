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
    oracle=None,  # stubbed codec — rows-only check
    doc="Binary-column feature extraction via Arrow-batched mapInPandas "
    "(SURVEY §7 step 7 multimodal): opaque payload → per-item digest + "
    "deterministic fake embedding. The decode seam is stubbed; schema, "
    "batching and partitioning are the real 100 TB plumbing. The declared "
    "query digests the embedding array (md5 of its JSON form) so the output "
    "is flat scalars — the harness canonicalizer can't sort list columns.",
    tags=("multimodal", "pandas-udf"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = decode_images(_media_from_documents(spark, sf_dir))
    return feats.select(
        "media_id",
        "n_bytes",
        "sha256",
        "width",
        "height",
        F.md5(F.to_json("embedding")).alias("embedding_md5"),
    )


@register(
    "q_multimodal_frames",
    oracle=None,  # metadata-only plan; exercised rows-only
    doc="Video frame-sampling plan (1 fps) from typed metadata — JVM-side "
    "sequence arithmetic, payload bytes never touched.",
    tags=("multimodal",),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_video_frames(_media_from_documents(spark, sf_dir), fps=1.0)


@register(
    "q_multimodal_audio",
    oracle=None,  # metadata-only plan; exercised rows-only
    doc="Audio analysis-window plan (5 s window, 2.5 s hop) from typed "
    "metadata — the STFT/encoder front-end shape; JVM-side window "
    "arithmetic, payload bytes never touched.",
    tags=("multimodal",),
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return plan_audio_windows(
        _media_from_documents(spark, sf_dir), window_s=5.0, hop_s=2.5
    )
