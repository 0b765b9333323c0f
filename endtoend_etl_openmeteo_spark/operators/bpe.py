"""Iterative BPE merge training — the tokenizer-training loop itself.

``plans/llm.q_bpe_pairs`` computes the statistic ONE merge iteration
maximizes; this operator runs the actual loop: find the most frequent
adjacent pair, fuse every leftmost-nonoverlapping occurrence corpus-wide,
repeat. The fuse step is genuinely sequential within a row (occurrences
must not overlap: merging (a,a) in "a a a" yields ["a+a", "a"], not two
overlapping pairs), which is exactly what a higher-order ``F.aggregate``
fold expresses — a struct accumulator (emitted tokens, pending token)
scanned left to right, entirely inside codegen, no UDF.

Scale shape (the kmeans pattern): per iteration ONE pair-count aggregate
(map-side combined, 8-byte-hashable keys) whose top-1 row comes to the
driver, then ONE map-only rewrite of the token arrays. Iterations
multiply jobs, not state; localCheckpoint truncates the per-iteration
plan growth. Driver state is the merge table — n_merges rows, bounded by
construction.

Word-level base units (matching q_bpe_pairs): the merge algebra is
identical at character level; only the initial split differs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.dedup import (
    cpu_parallelize,
    normalized_text,
)
from endtoend_etl_openmeteo_spark.session import release_checkpoint

#: Joiner for fused tokens. MUST be absent from the normalized token
#: stream, or literal occurrences collide with fused tokens and corrupt
#: later merge statistics — normalized_text only folds case/whitespace, so
#: printable joiners ('+', '_') are unsafe on real text ("c++", urls).
#: U+001E (ASCII record separator) is unprintable and never survives into
#: prose; render with ``fused.replace(JOINER, ' ')`` when displaying.
JOINER = "\x1e"


def merge_adjacent(tokens: Column, left: str, right: str) -> Column:
    """Fuse every leftmost-nonoverlapping adjacent (left, right) occurrence
    in a token array into one ``left+right`` token — one codegen fold.

    The accumulator carries (out, pend, has): tokens emitted so far, the
    one token of lookbehind, and whether the lookbehind slot is occupied
    ('' is a valid token, so a flag, not a sentinel). A matched pair
    consumes BOTH tokens and clears the lookbehind, which is what makes
    overlapping runs resolve leftmost-first.
    """
    fused = left + JOINER + right

    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit("").alias("pend"),
        F.lit(False).alias("has"),
    )

    def step(acc: Column, t: Column) -> Column:
        is_pair = acc["has"] & (acc["pend"] == F.lit(left)) & (t == F.lit(right))
        take_first = F.struct(
            acc["out"].alias("out"), t.alias("pend"), F.lit(True).alias("has")
        )
        fuse = F.struct(
            F.concat(acc["out"], F.array(F.lit(fused))).alias("out"),
            F.lit("").alias("pend"),
            F.lit(False).alias("has"),
        )
        slide = F.struct(
            F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
            t.alias("pend"),
            F.lit(True).alias("has"),
        )
        return F.when(~acc["has"], take_first).when(is_pair, fuse).otherwise(slide)

    finish = lambda acc: F.when(  # noqa: E731
        acc["has"], F.concat(acc["out"], F.array(acc["pend"]))
    ).otherwise(acc["out"])

    return F.aggregate(tokens, acc0, step, finish)


def _top_pair(toked: DataFrame) -> tuple[str, str, int] | None:
    """Most frequent adjacent pair (count desc, then lexicographic — the
    deterministic tie-break BPE needs for reproducible vocabularies)."""
    n = F.greatest(F.size("toks") - 1, F.lit(0))
    top = (
        toked.select(
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, n),
                    F.slice("toks", 2, n),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p")
        )
        .groupBy("p")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "p")
        .limit(1)
        .collect()
    )
    if not top:
        return None
    row = top[0]
    return (row["p"]["l"], row["p"]["r"], row["n"])


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_count: int = 2,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges over a corpus.

    Returns (merges, tokenized): ``merges`` is the ordered rule list
    [(step, left, right, pair_count), ...] — the artifact a tokenizer
    ships — and ``tokenized`` the corpus with a ``toks`` column after all
    merges applied. Stops early when no pair reaches ``min_count`` (a
    merge seen once generalizes to nothing).

    ``tokenized`` is a MATERIALIZED localCheckpoint (one corpus copy
    pinned in executor memory) and the CALLER owns its release: a caller that only
    keeps ``merges`` must ``release_checkpoint(tokenized)`` (session.py)
    or a long-lived driver leaks one corpus copy per training call.
    """
    # LAZY checkpoints: each round's pair-count aggregate is the action
    # that materializes the previous round's rewrite, so the rewrite and
    # the count run as ONE corpus pass instead of two (an eager rewrite
    # checkpoint plus a separate aggregate job paid 2·n_merges+1 corpus
    # jobs; this shape pays n_merges+2). Lineage still truncates at
    # every checkpoint — one fold per plan, never a growing fold chain.
    toked = cpu_parallelize(df).select(
        "*", F.split(normalized_text(text_col), " ").alias("toks")
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    prev: DataFrame | None = None
    for step_i in range(n_merges):
        top = _top_pair(toked)  # materializes `toked`'s lazy checkpoint
        if prev is not None:
            # toked's blocks now hold the corpus — the previous round's
            # copy (this round's only lineage input) is dead: release it
            # (one corpus copy live at a time, not one per merge rule)
            release_checkpoint(prev)
            prev = None
        if top is None or top[2] < min_count:
            break
        left, right, cnt = top
        merges.append((step_i, left, right, cnt))
        prev = toked
        toked = toked.withColumn(
            "toks", merge_adjacent(F.col("toks"), left, right)
        ).localCheckpoint(eager=False)
    if prev is not None or not merges:
        # the final rewrite (or the n_merges=0 tokenize) is still lazy —
        # materialize so the returned frame owns its blocks and the last
        # intermediate copy can be released, preserving the contract
        # that callers receive a checkpointed, self-contained frame
        toked.count()
        if prev is not None:
            release_checkpoint(prev)
    return merges, toked


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "toks",
) -> DataFrame:
    """Apply a trained merge table to new text — the tokenizer's INFERENCE
    half. Rules compose in training order as nested ``merge_adjacent``
    folds inside one projection: a map-only pass, no shuffle, no driver
    round-trips, O(n_merges · tokens) work per row.

    Applying the rules in order over the training corpus reproduces the
    trainer's own final tokenization exactly (pinned by
    tests/test_bpe.py) — the BPE property that makes offline-trained
    vocabularies portable to the scoring/packing pipeline.

    Expression depth grows with the rule count; for vocabulary-scale merge
    tables (10k+) chunk the application every few hundred rules with a
    ``localCheckpoint`` to bound codegen size — the fold algebra is
    unchanged.
    """
    expr: Column = F.split(normalized_text(text_col), " ")
    for _, left, right, _ in sorted(merges):
        expr = merge_adjacent(expr, left, right)
    return cpu_parallelize(df).withColumn(out_col, expr)
