"""Point-in-interval (range) join — an operator OSS Spark lacks natively.

A naive ``points JOIN intervals ON ts BETWEEN start AND end`` has no equi
key, so Catalyst plans a broadcast nested-loop / cartesian product:
O(|points| x |intervals|) comparisons, the classic does-not-survive-100x
shape (Databricks' range-join optimization is proprietary; this is the
portable form).

The scalable composition: chunk-bucket the time axis.

    intervals --explode--> one row per fixed-size chunk the interval
                           overlaps             (|R| * avg_len/chunk rows)
    points    --key-----> their containing chunk (narrow, no growth)
    equi-join on the chunk key, then re-check the exact bounds.

One hash shuffle on an 8-byte chunk key replaces the cross product; each
(point, interval) pair meets exactly once because a point lives in exactly
one chunk. Pick ``chunk`` near the median interval length: too coarse and
a chunk hosts many irrelevant intervals, too fine and intervals explode
into many rows. Heavily-hit chunks (a flash-sale window) are ordinary
join skew — salt the chunk key or let AQE's skew-join split them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHUNKS = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY", "week": "INTERVAL 7 DAYS"}


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    chunk: str = "day",
) -> DataFrame:
    """Inner-join each point to every interval with
    ``start <= ts < end`` (half-open, the engine's range convention).

    Output: all point columns + all interval columns. ``chunk`` is the
    bucketing granularity: ``hour`` | ``day`` | ``week``.

    Timezone contract: the chunk keys must be computed in a FIXED-OFFSET
    session timezone (the engine pins UTC, session.py). ``date_trunc``
    is wall-clock but ``sequence``'s INTERVAL step is fixed-duration, so
    in a DST-observing zone the two sides' keys diverge across a
    transition (a 23-hour day makes the interval side land on 01:00
    while the point side truncates to 00:00) and matches are silently
    dropped — correctness, not just values, depends on the UTC pin.
    """
    if chunk not in _CHUNKS:
        raise ValueError(f"chunk must be one of {sorted(_CHUNKS)}, got {chunk!r}")
    step = F.expr(_CHUNKS[chunk])
    trunc_unit = "week" if chunk == "week" else chunk

    # trunc(end) is included on purpose: an interval ending mid-chunk still
    # owns points in that chunk's early part (ts < end re-checks exactness).
    # Inverted intervals (end < start — malformed upstream rows) yield an
    # empty chunk list and match nothing: a bare sequence() would raise
    # 'Illegal sequence boundaries' and fail the WHOLE join for one bad row.
    exploded = intervals.withColumn(
        "__chunk",
        F.explode(
            F.when(
                F.col(end_col) >= F.col(start_col),
                F.sequence(
                    F.date_trunc(trunc_unit, F.col(start_col)),
                    F.date_trunc(trunc_unit, F.col(end_col)),
                    step,
                ),
            ).otherwise(F.array())
        ),
    )
    keyed = points.withColumn("__chunk", F.date_trunc(trunc_unit, F.col(ts_col)))
    return (
        keyed.join(exploded, "__chunk")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__chunk")
    )
