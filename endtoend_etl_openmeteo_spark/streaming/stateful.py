"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md guidance: the tool for operators Structured Streaming's
built-ins can't express).

Demonstrated operator: per-key running aggregates (count / sum / max) that
persist across micro-batches — the streaming analog of an ever-growing
groupBy, with explicit state the engine controls (built-in streaming aggs
hold equivalent state internally; the explicit form is the template for
genuinely custom logic: decaying counters, per-key models, CUSUM monitors).

Scale: state lives in the state store partitioned by key — the shuffle is
on the grouping key, state size is O(distinct keys), and a processing-time
timeout (configurable) is where idle-key eviction plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, max_value double"
STATE_SCHEMA = "n long, s double, m double"

#: State-side stand-in for "no non-null value seen yet". It never reaches
#: the output: _emit maps it to a true NULL max_value (SQL aggregate
#: semantics — sum/max skip NULLs, count(*) doesn't), where the raw
#: sentinel used to leak as max_value = -Infinity for all-NULL keys.
_NO_MAX = float("-inf")


def _fold(n: int, s: float, m: float, batches: Iterator[pd.DataFrame]):
    """NULL-aware fold: n counts ROWS (the event count), sum/max skip
    NULL values — the SQL aggregate convention."""
    for pdf in batches:
        n += len(pdf)
        vals = pdf["value"].dropna()
        if len(vals):
            s += float(vals.sum())
            m = max(m, float(vals.max()))
    return n, s, m


def _emit(key, n: int, s: float, m: float, **extra) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            # nullable Float64 so the sentinel becomes a true SQL NULL
            "max_value": pd.array([None if m == _NO_MAX else m], dtype="Float64"),
            **{k: [v] for k, v in extra.items()},
        }
    )


def _update_running(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for this key into persistent state and
    emit the updated running aggregate."""
    n, s, m = state.get if state.exists else (0, 0.0, _NO_MAX)
    n, s, m = _fold(n, s, m, batches)
    state.update((n, s, m))
    yield _emit(key, n, s, m)


EVICT_OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, max_value double, evicted boolean"
)


def _make_evicting_update(timeout_ms: int):
    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Idle key: emit the final row flagged as evicted, free the state.
            n, s, m = state.get
            state.remove()
            yield _emit(key, n, s, m, evicted=True)
            return
        n, s, m = state.get if state.exists else (0, 0.0, _NO_MAX)
        n, s, m = _fold(n, s, m, batches)
        state.update((n, s, m))
        state.setTimeoutDuration(timeout_ms)
        yield _emit(key, n, s, m, evicted=False)

    return update


def running_user_stats_with_eviction(
    events_stream: DataFrame, idle_timeout_ms: int = 60_000
) -> DataFrame:
    """running_user_stats with PROCESSING-TIME idle-key eviction — the
    state-store-bounding half the NoTimeout variant leaves out. A key that
    receives no events for ``idle_timeout_ms`` of processing time gets one
    final emission (``evicted=true``) and its state removed, so state size
    tracks ACTIVE keys, not all keys ever seen — at 100 TB-scale
    cardinality (user ids, session ids) an unevicted state store is the
    thing that eventually OOMs every executor.

    Timeouts fire at the end of any later micro-batch, so eviction rows
    ride the normal output stream (no side channel to reconcile).
    """
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_evicting_update(idle_timeout_ms),
            outputStructType=EVICT_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over a stream of events rows
    (user_id long, value double, ...). Update-mode output: one row per key
    per micro-batch it appeared in.

    Deployment note: pair with a RESTARTABLE sink (foreachBatch / files).
    The memory sink refuses checkpoint recovery, which silently forfeits
    the cross-restart state this operator exists to provide."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
