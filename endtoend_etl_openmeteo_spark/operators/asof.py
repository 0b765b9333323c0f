"""As-of (nearest-preceding-event) join — an operator Spark lacks natively
(SURVEY.md guidance: compose built-in DataFrame ops when semantics allow).

Implementation: the union-and-carry-forward trick —

    tag left/right rows, union into one spine, one window per key ordered
    by (ts, side, tiebreak), last(col, ignorenulls) carries the most recent
    right row forward onto each left row.

Scale: ONE shuffle on the join key (the window sorts within partitions;
no cross product, no range explosion). This beats bucketize-and-filter
whenever right-side density per key is unbounded, and is the shape a
1000-executor attribution job wants: all events of a key co-located once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    carry_cols: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``asof_<col>`` for each right carry column
    from the latest right row with ``right_ts <= left_ts`` on the same key
    (``direction="backward"``, inclusive) or the earliest right row with
    ``right_ts >= left_ts`` (``direction="forward"`` — the same carry
    window over a reversed timestamp order, still one shuffle). Ties and
    multiple right rows at the same instant resolve deterministically by
    ``tiebreak`` ascending — last one wins. Without a ``tiebreak``,
    duplicate right rows at the same (key, ts) fall back to xxhash64 of
    the carry columns, so the winner is still deterministic across
    runs/partitionings (value-dependent, but never partition-order-
    dependent).

    Output: all left columns + asof_* columns (null when nothing precedes
    or follows, per direction).

    The carry rides as ONE struct per right row, not per-column: an
    independent ``last(col, ignorenulls)`` per carry column would see
    THROUGH a genuinely-null field to an older right row, stitching
    asof_* values from different right rows into a combination that never
    existed (and returning stale data where the nearest row says null).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_payload = [c for c in left.columns if c not in key_cols]
    rtypes = dict(right.dtypes)
    carry_t = ", ".join(f"`asof_{c}`:{rtypes[c]}" for c in carry_cols)

    l = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb") if tiebreak is None
        else F.lit(None).cast(rtypes[tiebreak]).alias("__tb"),
        *left_payload,
        F.lit(None).cast(f"struct<{carry_t}>").alias("__carry"),
    )
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (
            # Deterministic fallback: without a caller tiebreak, equal-(key,ts)
            # right rows order by a value hash instead of partition order.
            F.xxhash64(*[F.col(c) for c in carry_cols])
            if tiebreak is None
            else F.col(tiebreak)
        ).alias("__tb"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        F.struct(
            *[F.col(c).alias(f"asof_{c}") for c in carry_cols]
        ).alias("__carry"),
    )

    order_ts = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_ts, F.col("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__carry", ignorenulls=True).over(w)
    spine = l.unionByName(r).select(
        *key_cols,
        "__side",
        *left_payload,
        *[carried[f"asof_{c}"].alias(f"asof_{c}") for c in carry_cols],
    )
    return spine.filter(F.col("__side") == 1).drop("__side")
