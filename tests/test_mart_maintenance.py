"""Streaming incremental mart maintenance
(streaming.run_streaming_mart_maintenance = agg-state algebra x versioned
table x Structured Streaming replay contract).

The invariant under test: after ANY sequence of micro-batches, restarts,
and epoch replays, finalize(vt_read(mart)) equals one full recompute over
every event ever landed — no batch lost, no batch double-counted.
"""

import shutil
import uuid
from datetime import datetime
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.merge import finalize_agg_state
from endtoend_etl_openmeteo_spark.operators.versioned import (
    latest_version,
    read_manifest,
    vt_history,
    vt_read,
)
from endtoend_etl_openmeteo_spark.streaming import (
    run_streaming_mart_maintenance,
)

TMP = Path(__file__).resolve().parent.parent / ".tmp"

SCHEMA = "event_type string, ts timestamp, value double"
KEYS = ["event_type"]
STATE_KEYS = ["event_type", "day"]


@pytest.fixture()
def workdir():
    d = TMP / f"mart_{uuid.uuid4().hex[:8]}"
    d.mkdir(parents=True, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _land(spark, landing: str, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)


def _run(spark, landing, mart, ckpt):
    q = run_streaming_mart_maintenance(
        spark, landing, mart, ckpt, SCHEMA, KEYS, "value",
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)


def _mart(spark, mart):
    rows = finalize_agg_state(vt_read(spark, mart), STATE_KEYS).collect()
    return sorted(
        (r["event_type"], r["day"], r["n_events"], r["sum_value"]) for r in rows
    )


def _full_recompute(spark, landing):
    from endtoend_etl_openmeteo_spark.operators.merge import agg_state

    ev = spark.read.parquet(landing).select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    rows = finalize_agg_state(
        agg_state(ev, STATE_KEYS, "value"), STATE_KEYS
    ).collect()
    return sorted(
        (r["event_type"], r["day"], r["n_events"], r["sum_value"]) for r in rows
    )


T1 = datetime(2024, 3, 1, 10)
T2 = datetime(2024, 3, 2, 11)


def test_mart_tracks_full_recompute_across_batches(spark, workdir):
    landing = str(workdir / "landing")
    mart = str(workdir / "mart")
    ckpt = str(workdir / "ckpt")
    _land(spark, landing, [("a", T1, 1.0), ("a", T1, 3.0), ("b", T2, 10.0)])
    _run(spark, landing, mart, ckpt)
    assert _mart(spark, mart) == _full_recompute(spark, landing)
    # second wave: new keys AND increments to existing (event_type, day)
    _land(spark, landing, [("a", T1, 5.0), ("c", T2, -2.0)])
    _run(spark, landing, mart, ckpt)
    got = _mart(spark, mart)
    assert got == _full_recompute(spark, landing)
    a_day1 = next(r for r in got if r[0] == "a")
    assert (a_day1[2], a_day1[3]) == (3, 9.0)  # merged, not replaced


def test_replayed_epoch_cannot_double_count(spark, workdir):
    landing = str(workdir / "landing")
    mart = str(workdir / "mart")
    ckpt = str(workdir / "ckpt")
    _land(spark, landing, [("a", T1, 2.0)])
    _run(spark, landing, mart, ckpt)
    v = latest_version(spark, mart)
    tag = read_manifest(spark, mart, v)["epoch"]
    # the TRUE crash window: the mart commit is durable but the stream
    # died before the checkpoint's commit marker landed — the offsets
    # survive, so the restart replays the SAME epoch with the SAME file
    # set under the SAME lineage run id (the marker file in the
    # checkpoint dir survives a crash; only wiping the dir resets it)
    commits = sorted(
        p for p in (Path(ckpt) / "commits").iterdir()
        if not p.name.startswith(".")
    )
    commits[-1].unlink()
    crc = commits[-1].parent / f".{commits[-1].name}.crc"
    if crc.exists():  # stale checksum blocks the atomic re-create on LocalFS
        crc.unlink()
    _run(spark, landing, mart, ckpt)
    # same (run, epoch) tag -> vt_overwrite_epoch no-op; mart unchanged
    assert read_manifest(spark, mart, latest_version(spark, mart))["epoch"] == tag
    assert latest_version(spark, mart) == v
    assert _mart(spark, mart) == _full_recompute(spark, landing)
    # by contrast, WIPING the checkpoint is a new lineage: epochs restart
    # at 0 under a FRESH run id, so reprocessing is deliberate — the old
    # path-derived id would have matched the dead lineage's tags and
    # silently skipped every batch (including ones bundling new files)
    shutil.rmtree(ckpt)
    _run(spark, landing, mart, ckpt)
    new_tag = read_manifest(spark, mart, latest_version(spark, mart))["epoch"]
    assert new_tag["run"] != tag["run"]


def test_every_epoch_commit_is_tagged_stream_overwrite(spark, workdir):
    landing = str(workdir / "landing")
    mart = str(workdir / "mart")
    ckpt = str(workdir / "ckpt")
    _land(spark, landing, [("a", T1, 1.0)])
    _land(spark, landing, [("b", T2, 2.0)])
    _run(spark, landing, mart, ckpt)  # maxFilesPerTrigger=1 -> 2 epochs
    ops = [h["op"] for h in vt_history(spark, mart)]
    assert ops == ["init", "stream-overwrite", "stream-overwrite"]
