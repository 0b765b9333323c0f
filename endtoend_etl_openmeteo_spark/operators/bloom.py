"""Broadcast Bloom-filter pruning — the map-side membership pre-filter.

The 100-TB decontamination / blocklist problem: screening every corpus
shingle against a reference set with a join shuffles the full corpus-side
key stream even when 99.9% of keys miss. A Bloom filter built over the
reference set and broadcast as ONE scalar row turns that into a map-side
projection: only keys the filter accepts (true hits + a tunable
false-positive residue) ever reach the exact verification join, so the
shuffle carries the survivors, not the corpus.

Design notes (Spark-first):
- The bitmap is a DENSE ``array<long>`` of ``num_bits/64`` packed words
  in a single row (``1<<20`` bits = 16384 longs = 128 KiB — far under
  broadcast limits; size by the classic ``m = -n*ln(p)/ln(2)^2`` at real
  reference-set cardinality). Dense matters: Spark's map type is an
  unsorted entry ARRAY, so ``element_at`` on a map is a linear scan —
  O(occupied) per probe; an array subscript is O(1).
- The sparse->dense scatter has no SQL primitive, so the build zero-fills
  gaps with a higher-order run-length expansion (zip each sorted
  (word_idx, word) entry with its predecessor index, emit
  ``repeat(0, gap) ++ [word]``, flatten, pad the tail) — one row,
  O(num_words), same trick family as ``dedup.token_counts``.
- Build and probe both stay in whole-stage codegen: ``xxhash64`` with k
  distinct literal seed prefixes for the hash family, ``bit_or``
  aggregation for the words, array subscript + bitwise AND for the
  probe. No UDFs. The bit arithmetic is emitted as SQL expression text
  (PySpark's ``shiftleft`` only takes a literal shift amount) from ONE
  helper shared by build and probe, so the two sides cannot drift.
- No false negatives by construction (same hash family both sides), so
  composing the filter with an exact inner join on the survivors yields
  EXACT results — the filter is invisible to semantics and the oracle,
  visible only to the shuffle row count.

Reference analog: none (extension surface, SURVEY.md §7) — this is the
standard Bloom-pruned semi-join used by e.g. Spark's own runtime
row-level filtering, lifted to an explicit operator the pipeline can aim
at any reference set (benchmark shingles, URL blocklists, seen-document
digests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_COL = "__bloom_words"


def _pos_sql(col: str, seed: int, num_bits: int) -> str:
    """SQL text for hash-function ``seed``'s bit position of ``col``.
    The column name is backtick-quoted: interpolated verbatim, a name
    with a space would fail parsing and a dotted one would silently
    resolve as a struct-field access — in BOTH build and probe, since
    this helper is shared."""
    quoted = "`" + col.replace("`", "``") + "`"
    return f"pmod(xxhash64({seed}, {quoted}), {num_bits})"


def _bit_sql(pos: str) -> str:
    """SQL text for the packed-word bit of a position expression."""
    return f"shiftleft(CAST(1 AS BIGINT), CAST(({pos}) % 64 AS INT))"


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 2,
) -> DataFrame:
    """Aggregate ``df[col]`` into a one-row Bloom bitmap.

    Returns a single-row DataFrame with column ``__bloom_words``
    (``array<long>`` of exactly ``num_bits/64`` packed words). The build
    is two codegen stages: explode k positions per value, partial+final
    ``bit_or`` per word — the shuffle carries at most ``num_bits/64``
    rows of 16 bytes — then a one-row dense scatter.
    """
    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    if num_hashes < 1:
        # zero hashes builds an all-zero bitmap that a real probe then
        # uses to reject EVERY key — false negatives from an operator
        # documented as having none
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    n_words = num_bits // 64
    positions = F.array(
        *[F.expr(_pos_sql(col, s, num_bits)) for s in range(num_hashes)]
    )
    # k hashes per reference row — CPU-bound, so a single-file reference
    # table must not serialize the pass onto one core (CLAUDE.md rule)
    words = (
        cpu_parallelize(df).select(F.explode(positions).alias("__pos"))
        .select(
            F.shiftright(F.col("__pos"), 6).alias("__word_idx"),
            F.expr(_bit_sql("__pos")).alias("__bit"),
        )
        .groupBy("__word_idx")
        .agg(F.bit_or("__bit").alias("__word"))
    )
    sparse = words.agg(
        F.sort_array(F.collect_list(F.struct("__word_idx", "__word"))).alias(
            "__es"
        )
    )
    es = F.col("__es")
    idxs = F.transform(es, lambda e: e["__word_idx"])
    # predecessor word index per entry (-1 for the first): gap sizes
    prevs = F.concat(
        F.array(F.lit(-1).cast("long")),
        F.slice(idxs, 1, F.greatest(F.size(idxs) - 1, F.lit(0))),
    )
    zero = F.lit(0).cast("long")
    segments = F.zip_with(
        es,
        prevs,
        lambda e, p: F.concat(
            F.array_repeat(zero, (e["__word_idx"] - p - 1).cast("int")),
            F.array(e["__word"]),
        ),
    )
    tail_pad = F.array_repeat(
        zero,
        F.when(F.size(es) > 0, F.lit(n_words - 1) - F.element_at(idxs, -1))
        .otherwise(F.lit(n_words))
        .cast("int"),
    )
    # zip_with null-pads against the [-1] seed on an EMPTY entry list and
    # the null segment poisons flatten — zero-fill that case directly
    dense = F.when(
        F.size(es) == 0, F.array_repeat(zero, n_words)
    ).otherwise(F.concat(F.flatten(segments), tail_pad))
    return sparse.select(dense.alias(BLOOM_COL))


def bloom_collect(bloom: DataFrame) -> Column:
    """Materialize a bloom_build row as ONE typed array literal.

    The collect is bounded metadata (``num_bits/8`` bytes, same class as
    the k-means centroid rows). Embedding the bitmap as a single
    ``Literal`` node — NOT cross-joining the one-row frame — matters: a
    BroadcastNestedLoopJoin copies the 128 KiB array into every probe
    output row (gigabytes of churn at corpus row counts), while a literal
    is one constant reference in generated code. The literal goes through
    SQL text + constant folding, not ``F.lit(list)`` — PySpark's lit on a
    Python list issues one py4j round-trip PER ELEMENT (~8 s for 16k
    words); one parsed ``array(...)`` expression is milliseconds.
    """
    words = bloom.collect()[0][BLOOM_COL]
    return F.expr(f"array({','.join(f'{w}L' for w in words)})")


def bloom_might_contain(
    col: str,
    bloom: Column,
    num_bits: int = 1 << 20,
    num_hashes: int = 2,
) -> Column:
    """Membership probe — a pure map-side filter, no join.

    Usage::

        bits = bloom_collect(bloom_build(ref, "key"))
        probe.filter(bloom_might_contain("key", bits))

    ``col`` is a column NAME (the hash positions are SQL-text-generated
    so the probe shares the build's exact hash family); ``bloom`` is the
    :func:`bloom_collect` literal; ``num_bits``/``num_hashes`` must match
    the build. O(1) array subscripts per hash.
    """
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64 (the build's rule)")
    checks = []
    for s in range(num_hashes):
        pos = _pos_sql(col, s, num_bits)
        word = F.element_at(
            bloom, (F.shiftright(F.expr(pos), 6) + F.lit(1)).cast("int")
        )
        checks.append(word.bitwiseAND(F.expr(_bit_sql(pos))) != F.lit(0))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
