"""applyInPandasWithState: state persists across micro-batches and the
final running aggregates equal the batch ground truth."""

import shutil
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.streaming.stateful import running_user_stats

TMP = Path(__file__).resolve().parent.parent / ".tmp"


@pytest.fixture()
def workdir():
    d = TMP / f"state_{uuid.uuid4().hex[:8]}"
    d.mkdir(parents=True, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_running_stats_across_micro_batches(spark, workdir):
    src = workdir / "events"
    src.mkdir()
    # two separate files -> with maxFilesPerTrigger=1, two micro-batches
    t1 = pa.table({"user_id": [1, 1, 2], "value": [1.0, 2.0, 10.0]})
    t2 = pa.table({"user_id": [1, 3], "value": [4.0, 7.0]})
    pq.write_table(t1, src / "a.parquet")
    pq.write_table(t2, src / "b.parquet")

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"running_{uuid.uuid4().hex[:6]}"
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(workdir / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # memory sink in update mode appends each emission; row ORDER is not
    # guaranteed across micro-batches, but running counts only grow, so the
    # final state per user is its max-n_events emission
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    final = {}
    for r in rows:
        prev = final.get(r.user_id)
        if prev is None or r.n_events > prev[0]:
            final[r.user_id] = (r.n_events, r.sum_value, r.max_value)
    assert final[1] == (3, 7.0, 4.0)  # state carried across both batches
    assert final[2] == (1, 10.0, 10.0)
    assert final[3] == (1, 7.0, 7.0)
    # user 1 appeared in two micro-batches -> two emissions, proving the
    # state store fed the later batch with the earlier batch's totals.
    # Which file forms batch 1 is nondeterministic (same mtime), so the
    # partial count is 1 or 2 — but the final must be the full 3.
    user1_emissions = sorted(r.n_events for r in rows if r.user_id == 1)
    assert len(user1_emissions) == 2
    assert user1_emissions[0] in (1, 2) and user1_emissions[1] == 3


def test_running_stats_kill_and_resume(spark, workdir):
    """Cross-RESTART state recovery (the T3 proof for the custom stateful
    operator): a terminated query's per-key state must be rebuilt from the
    checkpointed state store by a brand-new query instance, so totals keep
    accumulating instead of restarting from zero. Sink is foreachBatch →
    parquet (restartable — the memory sink refuses recovery by design)."""
    src = workdir / "events"
    src.mkdir()
    out = workdir / "out"
    ckpt = str(workdir / "ckpt")

    def sink(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            str(out)
        )

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            running_user_stats(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Run 1 sees only file a, then terminates — state survives ONLY in the
    # checkpointed state store.
    pq.write_table(
        pa.table({"user_id": [1, 1, 2], "value": [1.0, 2.0, 10.0]}), src / "a.parquet"
    )
    run_once()
    first = {
        r.user_id: (r.n_events, r.sum_value, r.max_value)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert first[1] == (2, 3.0, 2.0) and first[2] == (1, 10.0, 10.0)

    # New data lands; a brand-new query resumes from the same checkpoint.
    pq.write_table(pa.table({"user_id": [1, 3], "value": [4.0, 7.0]}), src / "b.parquet")
    run_once()

    rows = spark.read.parquet(str(out)).collect()
    final = {}
    for r in rows:
        prev = final.get(r.user_id)
        if prev is None or r.n_events > prev[0]:
            final[r.user_id] = (r.n_events, r.sum_value, r.max_value)
    # user 1's run-2 emission folds run-1 state (2, 3.0, 2.0) + file b's row
    assert final[1] == (3, 7.0, 4.0)
    assert final[2] == (1, 10.0, 10.0)  # untouched by run 2
    assert final[3] == (1, 7.0, 7.0)
    # run 2 processed ONLY file b: exactly one new emission for user 1
    assert sorted(r.n_events for r in rows if r.user_id == 1) == [2, 3]


def test_idle_key_eviction_emits_final_row_and_frees_state(spark, workdir):
    """ProcessingTimeTimeout: a key idle past the timeout gets one
    evicted=true emission when a later micro-batch advances processing
    time, and its state is removed — the state-bounding behavior that
    keeps per-key state tracking ACTIVE keys only."""
    import time as _time

    from endtoend_etl_openmeteo_spark.streaming.stateful import (
        running_user_stats_with_eviction,
    )

    src = workdir / "events"
    src.mkdir()
    out = workdir / "out"
    ckpt = str(workdir / "ckpt")

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(str(out))

    def rows():
        try:
            return spark.read.parquet(str(out)).collect()
        except Exception:
            return []

    # A continuous micro-batch trigger, NOT availableNow: expired timers
    # need a later micro-batch to fire in, and availableNow stops
    # scheduling batches once the data is drained (the query then idles
    # un-terminated with the timer pending).
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        running_user_stats_with_eviction(stream, idle_timeout_ms=1)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        def wait_for(pred, what, timeout=90):
            deadline = _time.time() + timeout
            while _time.time() < deadline:
                if pred(rows()):
                    return
                _time.sleep(0.5)
            raise AssertionError(f"timed out waiting for {what}")

        pq.write_table(
            pa.table({"user_id": [1, 1], "value": [1.0, 2.0]}), src / "a.parquet"
        )
        wait_for(lambda rs: any(r.user_id == 1 and not r.evicted for r in rs),
                 "key 1 accumulation")
        # key 2 arrives; key 1's expired idle timer fires in a later batch
        # emitting its final totals with evicted=true
        pq.write_table(pa.table({"user_id": [2], "value": [9.0]}), src / "b.parquet")
        wait_for(lambda rs: any(
            r.evicted and (r.user_id, r.n_events, r.sum_value) == (1, 2, 3.0)
            for r in rs), "key 1 eviction row")
        # key 1 reappears AFTER eviction — state must restart from zero
        pq.write_table(pa.table({"user_id": [1], "value": [5.0]}), src / "c.parquet")
        wait_for(lambda rs: any(
            not r.evicted and (r.user_id, r.n_events, r.sum_value) == (1, 1, 5.0)
            for r in rs), "key 1 fresh state after eviction")
        assert not any(
            not r.evicted and r.user_id == 1 and r.n_events == 3 for r in rows()
        ), "evicted state leaked into the key's new incarnation"
    finally:
        q.stop()
        q.awaitTermination(30)


def test_all_null_values_emit_null_max_not_neg_infinity():
    """A key whose value column is all-NULL must emit max_value = NULL
    (SQL aggregate semantics: sum/max skip NULLs, the row count doesn't)
    — the -inf state sentinel must never leak into the output."""
    import pandas as pd

    from endtoend_etl_openmeteo_spark.streaming.stateful import (
        _NO_MAX,
        _emit,
        _fold,
    )

    nulls = pd.DataFrame({"value": [None, None]}, dtype="float64")
    n, s, m = _fold(0, 0.0, _NO_MAX, iter([nulls]))
    assert (n, s, m) == (2, 0.0, _NO_MAX)
    out = _emit((1,), n, s, m, evicted=False)
    assert out["n_events"][0] == 2 and out["sum_value"][0] == 0.0
    assert pd.isna(out["max_value"][0])
    # mixed batch: NULLs skipped, real values aggregate
    mixed = pd.DataFrame({"value": [None, 3.0, 1.0]}, dtype="float64")
    n, s, m = _fold(n, s, m, iter([mixed]))
    assert (n, s, m) == (5, 4.0, 3.0)
    assert _emit((1,), n, s, m)["max_value"][0] == 3.0
