"""Streaming ELT tests (SURVEY.md §2.9 T1-T4, §7 step 6)."""

import shutil
import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.sources.bronze import write_bronze
from endtoend_etl_openmeteo_spark.streaming import run_streaming_elt
from tests.test_weather_pipeline import GOOD_ROWS, _bronze_df, _payload

TMP = Path(__file__).resolve().parent.parent / ".tmp"


@pytest.fixture()
def workdir():
    d = TMP / f"stream_{uuid.uuid4().hex[:8]}"
    d.mkdir(parents=True, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_elt_exactly_once_and_merge(spark, workdir):
    bronze = str(workdir / "bronze")
    silver = str(workdir / "silver")
    ckpt = str(workdir / "ckpt")

    write_bronze(_bronze_df(spark, GOOD_ROWS), bronze)
    q = run_streaming_elt(spark, bronze, silver, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(silver)
    assert first.count() == 6  # 1 + 2 + 4 hourly rows (Berlin file has 2)
    ing1 = {r.city: r for r in first.collect()}

    # T3 exactly-once: add ONE new file; a resumed stream with the same
    # checkpoint must process only it (existing rows keep _ingested_at).
    late = _payload(
        "Warsaw", "2025-10-31", "13", ["2025-10-31T13:00"], [14.0], [0.0], [4.0]
    )
    write_bronze(_bronze_df(spark, [late]), bronze)
    q2 = run_streaming_elt(spark, bronze, silver, ckpt)
    q2.awaitTermination(120)
    second = spark.read.parquet(silver)
    assert second.count() == 7
    # unchanged keys kept their original ingest timestamps -> not reprocessed
    again = {r.city: r for r in second.filter(F.col("city") == "Berlin").collect()}
    assert all(
        r._ingested_at == ing1["Berlin"]._ingested_at for r in again.values()
    )


def test_streaming_daily_agg_window(spark, workdir):
    """Tumbling 1-day window agg over a drained stream equals the batch mart."""
    from endtoend_etl_openmeteo_spark.streaming import (
        stream_bronze,
        streaming_daily_agg,
        streaming_hourly,
    )

    bronze = str(workdir / "bronze")
    write_bronze(_bronze_df(spark, GOOD_ROWS), bronze)

    agg = streaming_daily_agg(streaming_hourly(stream_bronze(spark, bronze)))
    name = f"mart_{uuid.uuid4().hex[:6]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.city: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert rows["Paris"].temperature_2m == pytest.approx(11.5)
    assert rows["Berlin"].temperature_2m == pytest.approx(16.8)
    assert rows["Warsaw"].day.day == 31
