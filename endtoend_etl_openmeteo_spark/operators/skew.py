"""Skew-resilient window execution (SURVEY.md §4 scale extension).

A window function partitioned by a hot key is the one shuffle shape
neither AQE nor salting can fix: AQE's skew handling splits JOIN
partitions only, and salting changes window semantics (frames must see
the whole key). ``Window.partitionBy(hot_key)`` therefore serializes the
key's entire history through ONE task — at 100 TB a single heavy user or
a 5-value ``event_type`` column turns an 8-hour cluster job into one
straggler core.

The classic fix is two-phase scan decomposition (the distributed
prefix-sum): split each key's ordered stream into CHUNKS, compute inside
chunks in parallel, and stitch boundaries with per-chunk summaries that
are tiny by construction.

- :func:`chunked_running_sum` — unbounded-preceding running aggregates:
  within-chunk running sum + cumulative offset of whole-chunk totals
  (one window over #chunks rows per key, not #rows).
- :func:`global_row_number` — per-key dense row numbers without a
  serialized per-key window: within-chunk row_number + cumulative
  chunk-count offsets. The distributed zipWithIndex, per key.
- :func:`chunked_moving_agg` — exact ROWS-frame moving aggregates: number
  rows with :func:`global_row_number`, re-chunk into fixed-size row
  blocks (every block full except the last), copy each block's tail
  ``k`` rows into the next block as halo, window inside blocks, drop the
  halo. Exact for every row because a block's predecessor is always full.

Chunking uses a TIME bin (``chunk_seconds``) as the parallelism unit, so
a hot key splits across its time axis. The residual serial unit is one
(key, time-bin) cell — choose ``chunk_seconds`` so a cell's rows fit a
task (e.g. hourly bins for a key writing ~10k rows/hour). A key whose
rows all share ONE timestamp stays serial; that degenerate shape needs a
semantic change (sub-ordering column), not an execution trick.

Results are bit-identical to the plain window except for float addition
order inside sums (same caveat as any shuffle-order change; round at the
comparison seam, as the declared queries do).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _join_offsets(within: DataFrame, offsets: DataFrame, on: list[str]) -> DataFrame:
    """Stitch per-row frames to their per-chunk offsets NULL-SAFELY: the
    plain window this module decomposes treats a NULL key (and a NULL ts
    → NULL chunk) as an ordinary partition, but a plain inner equi-join
    would match NULL to nothing and silently DROP those rows — breaking
    the bit-identical contract. eqNullSafe keys keep them and stay
    hash-joinable (EqualNullSafe is a sargable join key)."""
    left, right = within.alias("__l"), offsets.alias("__r")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__l.{c}").eqNullSafe(F.col(f"__r.{c}")) for c in on],
    )
    return left.join(right, cond).select("__l.*", "__r.__off")


def _time_chunk(ts_col: str, chunk_seconds: int) -> Column:
    # integer division of the epoch keeps the bin a plain long — window
    # ORDER BY over it is exact, and +1 arithmetic (halo shift) is trivial
    return (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000 * chunk_seconds)).cast(
        "long"
    )


def chunked_running_sum(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
    chunk_seconds: int = 3600,
    out_col: str = "running_sum",
) -> DataFrame:
    """``sum(value) OVER (PARTITION BY keys ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` without serializing a hot key: within-chunk running sums
    run parallel per (key, time-bin); the cross-chunk carry is a window
    over per-chunk TOTALS (#bins rows per key — driver-free, but four
    orders of magnitude smaller than the data).

    ``order_cols`` must start with ``ts_col`` (the chunk bin is a prefix
    of the order, otherwise chunk-local order != global order).
    """
    if not order_cols or order_cols[0] != ts_col:
        raise ValueError(
            f"order_cols must start with ts_col ({ts_col!r}): the time chunk "
            "is only a valid order prefix if time leads the ordering"
        )
    chunked = df.withColumn("__chunk", _time_chunk(ts_col, chunk_seconds))
    w_in = (
        Window.partitionBy(*key_cols, "__chunk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = chunked.withColumn("__within", F.sum(value_col).over(w_in))
    totals = chunked.groupBy(*key_cols, "__chunk").agg(
        F.sum(value_col).alias("__ctot")
    )
    w_off = (
        Window.partitionBy(*key_cols)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # type-preserving zero: a bare 0.0 literal would promote integral
    # running sums to double (losing exactness past 2^53 and changing the
    # output type vs the plain window this decomposes)
    offsets = totals.withColumn(
        "__off",
        F.coalesce(
            F.sum("__ctot").over(w_off),
            F.lit(0).cast(totals.schema["__ctot"].dataType),
        ),
    ).drop("__ctot")
    return (
        _join_offsets(within, offsets, [*key_cols, "__chunk"])
        .withColumn(out_col, F.col("__within") + F.col("__off"))
        .drop("__chunk", "__within", "__off")
    )


def global_row_number(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    ts_col: str = "ts",
    chunk_seconds: int = 3600,
    out_col: str = "__grn",
) -> DataFrame:
    """Per-key 1..n row numbers over ``order_cols`` without a serialized
    per-key window: row_number inside each (key, time-bin) cell plus the
    cumulative count of earlier bins (same offset trick as
    layout.global_shuffle_index, but per key and with no driver state)."""
    if not order_cols or order_cols[0] != ts_col:
        raise ValueError(
            f"order_cols must start with ts_col ({ts_col!r})"
        )
    chunked = df.withColumn("__chunk", _time_chunk(ts_col, chunk_seconds))
    w_in = Window.partitionBy(*key_cols, "__chunk").orderBy(*order_cols)
    within = chunked.withColumn("__rnin", F.row_number().over(w_in))
    counts = chunked.groupBy(*key_cols, "__chunk").agg(F.count("*").alias("__cnt"))
    w_off = (
        Window.partitionBy(*key_cols)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0).cast("long"))
    ).drop("__cnt")
    return (
        _join_offsets(within, offsets, [*key_cols, "__chunk"])
        .withColumn(out_col, (F.col("__off") + F.col("__rnin")).cast("long"))
        .drop("__chunk", "__rnin", "__off")
    )


def chunked_moving_agg(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    frame_rows: int,
    agg: str = "avg",
    ts_col: str = "ts",
    chunk_seconds: int = 3600,
    block_rows: int = 4096,
    out_col: str = "mov_agg",
) -> DataFrame:
    """``agg(value) OVER (PARTITION BY keys ORDER BY order ROWS BETWEEN
    frame_rows PRECEDING AND CURRENT ROW)``, hot-key-parallel and EXACT:

    1. :func:`global_row_number` assigns per-key positions (parallel).
    2. Rows re-chunk into fixed ``block_rows`` blocks by position — every
       block except a key's last is exactly full.
    3. Each block's tail ``frame_rows`` rows are copied into the NEXT
       block as halo; since the preceding block is always full, every row
       sees its complete frame inside (block + halo). Halo copies are
       dropped after the in-block window.

    Work per task is O(block_rows + frame_rows); the halo duplication
    factor is frame_rows/block_rows (<1% at the defaults).
    """
    if frame_rows >= block_rows:
        raise ValueError(
            f"block_rows ({block_rows}) must exceed frame_rows ({frame_rows}): "
            "a block must contain every frame that ends inside it"
        )
    if agg not in ("avg", "sum", "min", "max", "count"):
        raise ValueError(f"unsupported rows-frame aggregate {agg!r}")
    numbered = global_row_number(
        df, key_cols, order_cols, ts_col=ts_col, chunk_seconds=chunk_seconds
    )
    block = F.floor((F.col("__grn") - 1) / F.lit(block_rows)).cast("long")
    pos_in_block = (F.col("__grn") - 1) % F.lit(block_rows)
    base = numbered.withColumn("__block", block).withColumn(
        "__halo", F.lit(False)
    )
    halo = (
        base.filter(pos_in_block >= F.lit(block_rows - frame_rows))
        .withColumn("__block", F.col("__block") + 1)
        .withColumn("__halo", F.lit(True))
    )
    w = (
        Window.partitionBy(*key_cols, "__block")
        .orderBy("__grn")
        .rowsBetween(-frame_rows, Window.currentRow)
    )
    agg_col = getattr(F, agg)(value_col).over(w)
    return (
        base.unionByName(halo)
        .withColumn(out_col, agg_col)
        .filter(~F.col("__halo"))
        .drop("__block", "__halo", "__grn")
    )
