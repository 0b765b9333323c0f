from endtoend_etl_openmeteo_spark.streaming.pipeline import (
    run_streaming_ann_ingest,
    run_streaming_corpus_ingest,
    run_streaming_elt,
    run_streaming_mart_maintenance,
    stream_bronze,
    stream_stream_join,
    streaming_daily_agg,
    streaming_dedup,
    streaming_hourly,
    streaming_sessionize,
)

__all__ = [
    "run_streaming_ann_ingest",
    "run_streaming_corpus_ingest",
    "run_streaming_elt",
    "run_streaming_mart_maintenance",
    "stream_bronze",
    "stream_stream_join",
    "streaming_daily_agg",
    "streaming_dedup",
    "streaming_hourly",
    "streaming_sessionize",
]
