"""Incremental MinHash dedup: cross-batch detection, intra-batch pairs,
index growth, rerun idempotency."""

import shutil
import uuid
from pathlib import Path

import pytest

from endtoend_etl_openmeteo_spark.operators.dedup import incremental_neardup

TMP = Path(__file__).resolve().parent.parent / ".tmp"

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away home "
    "tonight while the moon rises slowly over the quiet sleeping town"
)


@pytest.fixture()
def index_path():
    d = TMP / f"mh_index_{uuid.uuid4().hex[:8]}"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_neardup_across_batches(spark, index_path):
    batch1 = _docs(
        spark,
        [
            (1, BASE),
            (2, "completely different content about spark engines and parquet"),
        ],
    )
    pairs1 = incremental_neardup(
        spark, batch1, index_path, "doc_id", "text"
    ).collect()
    assert pairs1 == []  # nothing similar inside batch 1
    assert spark.read.parquet(index_path).count() == 2

    # batch 2: one near-copy of doc 1 (tail words changed), one fresh doc,
    # and two intra-batch near-copies of each other
    near = BASE.replace("quiet sleeping town", "quiet sleepy village")
    other = "unrelated text on streaming watermarks and stateful operators"
    batch2 = _docs(
        spark,
        [
            (10, near),
            (11, other),
            (12, other + " with a small suffix"),
        ],
    )
    pairs2 = incremental_neardup(
        spark, batch2, index_path, "doc_id", "text"
    ).collect()
    got = {(r.new_id, r.match_id): (r.match_is_new, r.est_jaccard) for r in pairs2}
    assert (10, 1) in got and got[(10, 1)][0] is False  # cross-batch hit
    assert got[(10, 1)][1] >= 0.5
    assert (11, 12) in got and got[(11, 12)][0] is True  # intra-batch hit
    assert all(nid in (10, 11, 12) for nid, _ in got)  # pairs always lead with new
    assert spark.read.parquet(index_path).count() == 5

    # rerunning the same batch: same pairs (minus intra-batch orientation —
    # previously-new docs are now indexed), index unchanged
    pairs3 = incremental_neardup(
        spark, batch2, index_path, "doc_id", "text"
    ).collect()
    rerun = {(r.new_id, r.match_id) for r in pairs3}
    assert (10, 1) in rerun
    assert spark.read.parquet(index_path).count() == 5


def test_incremental_neardup_batch_stamped_layout(spark, index_path):
    """batch_id mode: each batch owns a batch=<id> subdir; reruns and
    sibling batches never clobber each other."""
    b1 = _docs(spark, [(1, BASE), (2, "totally unrelated words about jdbc sinks")])
    assert incremental_neardup(
        spark, b1, index_path, "doc_id", "text", batch_id="b1"
    ).collect() == []
    near = BASE.replace("quiet sleeping town", "quiet sleepy village")
    b2 = _docs(spark, [(10, near)])
    pairs = incremental_neardup(
        spark, b2, index_path, "doc_id", "text", batch_id="b2"
    ).collect()
    assert {(r.new_id, r.match_id) for r in pairs} == {(10, 1)}
    assert sorted(
        p.name for p in Path(index_path).iterdir() if p.name.startswith("batch=")
    ) == ["batch=b1", "batch=b2"]
    assert spark.read.parquet(index_path).count() == 3


def test_incremental_neardup_flat_index_visible_from_batch_mode(spark, index_path):
    """An index that started with legacy flat appends and later switched to
    batch_id mode must still match against the flat-era signatures."""
    incremental_neardup(  # legacy write — no batch_id
        spark, _docs(spark, [(1, BASE)]), index_path, "doc_id", "text"
    )
    near = BASE.replace("quiet sleeping town", "quiet sleepy village")
    pairs = incremental_neardup(
        spark, _docs(spark, [(10, near)]), index_path, "doc_id", "text", batch_id="b2"
    ).collect()
    assert {(r.new_id, r.match_id) for r in pairs} == {(10, 1)}
    # NOTE a mixed (flat files + batch dirs) index is NOT readable with a
    # bare read.parquet(root) — Spark's partition discovery drops the root
    # files. The operator's explicit path listing is the read path.
    from endtoend_etl_openmeteo_spark.operators.dedup import _sibling_batch_paths

    all_paths = _sibling_batch_paths(spark, index_path, batch_id="__none__")
    assert spark.read.parquet(*all_paths).select("id").distinct().count() == 2


def test_incremental_neardup_rerun_after_partial_write(spark, index_path):
    """Crash-recovery: a batch whose index write died mid-append leaves a
    partial batch=<id> subdir. Rerunning the SAME batch_id must return the
    full correct pair set (partial contents don't count as 'already
    indexed') and leave the index with exactly one signature per doc."""
    b1 = _docs(spark, [(1, BASE), (2, "totally unrelated words about jdbc sinks")])
    incremental_neardup(spark, b1, index_path, "doc_id", "text", batch_id="b1")

    near = BASE.replace("quiet sleeping town", "quiet sleepy village")
    other = "unrelated text on streaming watermarks and stateful operators"
    b2 = _docs(spark, [(10, near), (11, other), (12, other + " with a small suffix")])

    # Simulate the crashed first attempt: only doc 11's signature landed.
    partial = _docs(spark, [(11, other)])
    incremental_neardup(spark, partial, index_path, "doc_id", "text", batch_id="b2")

    # Rerun of the full batch under the same batch_id.
    pairs = incremental_neardup(
        spark, b2, index_path, "doc_id", "text", batch_id="b2"
    ).collect()
    got = {(r.new_id, r.match_id): r.match_is_new for r in pairs}
    assert (10, 1) in got and got[(10, 1)] is False  # cross-batch hit survives
    assert (11, 12) in got and got[(11, 12)] is True  # intra-batch hit NOT lost
    # to the partial write: doc 11's stale sig was excluded and replaced
    idx = spark.read.parquet(index_path)
    assert idx.count() == 5
    assert idx.select("id").distinct().count() == 5


def test_incremental_neardup_identical_text_estimates_one(spark, index_path):
    incremental_neardup(
        spark, _docs(spark, [(1, BASE)]), index_path, "doc_id", "text"
    )
    pairs = incremental_neardup(
        spark, _docs(spark, [(2, BASE)]), index_path, "doc_id", "text"
    ).collect()
    assert [(r.new_id, r.match_id, r.est_jaccard) for r in pairs] == [(2, 1, 1.0)]


def test_incremental_exact_dedup_semantics(spark, index_path):
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    other = "unrelated text on streaming watermarks and stateful operators"
    b1 = _docs(spark, [(1, BASE), (2, other)])
    assert (
        incremental_exact_dedup(spark, b1, index_path, "doc_id", "text", batch_id="b1")
        .collect()
        == []
    )
    assert spark.read.parquet(index_path).count() == 2

    # batch 2: exact copy of doc 1 (cross-batch), a WHITESPACE/CASE variant
    # of doc 2 (normalization must equate them), an intra-batch dup pair,
    # and a near-dup that exact MUST NOT flag.
    near = BASE.replace("quiet sleeping town", "quiet sleepy village")
    b2 = _docs(
        spark,
        [
            (10, BASE),
            (11, "  " + other.upper() + "  "),
            (12, "fresh doc body"),
            (13, "fresh  doc body"),
            (14, near),
        ],
    )
    pairs = incremental_exact_dedup(
        spark, b2, index_path, "doc_id", "text", batch_id="b2"
    ).collect()
    got = {(r.new_id, r.match_id): r.match_is_new for r in pairs}
    assert got == {(10, 1): False, (11, 2): False, (12, 13): True}
    idx = spark.read.parquet(index_path)
    assert idx.count() == 7 and idx.select("id").distinct().count() == 7


def test_incremental_exact_dedup_rerun_after_partial_write(spark, index_path):
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    other = "unrelated text on streaming watermarks and stateful operators"
    incremental_exact_dedup(
        spark, _docs(spark, [(1, BASE)]), index_path, "doc_id", "text", batch_id="b1"
    )
    b2 = _docs(spark, [(10, BASE), (11, other), (12, other)])
    # crashed first attempt: only doc 11 landed in batch=b2
    incremental_exact_dedup(
        spark, _docs(spark, [(11, other)]), index_path, "doc_id", "text", batch_id="b2"
    )
    pairs = incremental_exact_dedup(
        spark, b2, index_path, "doc_id", "text", batch_id="b2"
    ).collect()
    got = {(r.new_id, r.match_id): r.match_is_new for r in pairs}
    # cross-batch hit survives; the intra-batch pair is NOT lost to the
    # partial write (doc 11's stale digest was excluded and replaced)
    assert got == {(10, 1): False, (11, 12): True}
    idx = spark.read.parquet(index_path)
    assert idx.count() == 4 and idx.select("id").distinct().count() == 4

def test_index_files_sized_to_novel_rows(spark, index_path):
    """File sizing counts the rows actually written (post anti-join), not
    the raw batch: a mostly-duplicate batch writes ONE parquet file, and
    reruns of an all-duplicate batch add one (empty-payload) file, never
    tasks-per-batch near-empty files."""
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    def _data_files():
        return [
            p for p in Path(index_path).rglob("*.parquet")
            if not p.name.startswith("_")
        ]

    b1 = _docs(spark, [(i, f"document number {i} entirely unique") for i in range(40)])
    incremental_exact_dedup(spark, b1, index_path, "doc_id", "text")
    assert len(_data_files()) == 1

    # batch 2: 39 already-indexed ids resubmitted + 1 novel id — only the
    # novel id is appended, in exactly one file
    b2 = _docs(
        spark,
        [(i, f"document number {i} entirely unique") for i in range(39)]
        + [(999, "a genuinely new document")],
    )
    incremental_exact_dedup(spark, b2, index_path, "doc_id", "text")
    assert len(_data_files()) == 2  # exactly one new file for 1 novel row
    assert spark.read.parquet(index_path).count() == 41


def test_compact_dedup_index_preserves_screen_and_bounds_dirs(spark, index_path):
    """Consolidating old batch= dirs into one segment must leave the
    screen's verdicts untouched (matching depends on the indexed SET,
    not file placement) and hold the directory count bounded under
    continuous batches — the third store's maintenance tick."""
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        compact_dedup_index,
        incremental_exact_dedup,
    )

    def batch(n, text_suffix=""):
        return _docs(spark, [(n * 10 + j, f"batch {n} doc {j}{text_suffix}")
                             for j in range(3)])

    for n in range(8):
        incremental_exact_dedup(spark, batch(n), index_path, "doc_id", "text",
                                batch_id=f"b{n:03d}")

    def dirs():
        return sorted(p.name for p in Path(index_path).iterdir()
                      if p.name.startswith("batch="))

    assert len(dirs()) == 8
    res = compact_dedup_index(spark, index_path, keep_last=2)
    assert res["batches_merged"] == 6 and res["rows_merged"] == 18
    after = dirs()
    assert len(after) == 3  # segment + 2 kept batches
    assert after[0] == "batch=__seg_000000"

    # the screen still sees every consolidated signature: resubmitting a
    # copy of an OLD batch's doc must match it cross-batch
    probe = _docs(spark, [(999, "batch 0 doc 1")])
    pairs = incremental_exact_dedup(spark, probe, index_path, "doc_id", "text",
                                    batch_id="b999").collect()
    assert {(r.new_id, r.match_id) for r in pairs} == {(999, 1)}

    # a second tick folds the first segment plus aged-out batches
    incremental_exact_dedup(spark, batch(9), index_path, "doc_id", "text",
                            batch_id="b009")
    res2 = compact_dedup_index(spark, index_path, keep_last=2)
    assert res2["batches_merged"] >= 2
    assert len(dirs()) <= 4
    # totals conserved through both ticks (24 batch rows + probe + b9)
    assert spark.read.parquet(index_path).count() == 8 * 3 + 1 + 3


def test_compact_dedup_index_ranks_segments_oldest_for_numeric_ids(spark, index_path):
    """Digit-leading batch ids sort BEFORE 'batch=__seg_*' by raw name;
    the keep_last window must still protect the most recent REAL batches
    (segments rank oldest regardless of name)."""
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        compact_dedup_index,
        incremental_exact_dedup,
    )

    def batch(n):
        return _docs(spark, [(n * 10 + j, f"numeric batch {n} doc {j}")
                             for j in range(2)])

    for n in range(5):  # ids '20260801'..'20260805' — sort before '__seg_'
        incremental_exact_dedup(spark, batch(n), index_path, "doc_id", "text",
                                batch_id=f"2026080{n + 1}")
    compact_dedup_index(spark, index_path, keep_last=2)

    def dirs():
        return sorted(p.name for p in Path(index_path).iterdir()
                      if p.name.startswith("batch="))

    # the two NEWEST real batches survive; the three oldest merged
    assert dirs() == ["batch=20260804", "batch=20260805", "batch=__seg_000000"]

    # second tick with one more batch: the segment (not the newest real
    # batches) must be ranked oldest and folded
    incremental_exact_dedup(spark, batch(5), index_path, "doc_id", "text",
                            batch_id="20260806")
    compact_dedup_index(spark, index_path, keep_last=2)
    assert dirs() == ["batch=20260805", "batch=20260806", "batch=__seg_000001"]
    assert spark.read.parquet(index_path).count() == 12


def test_compact_dedup_index_keeps_newest_batches_by_mtime_not_name(
    spark, index_path
):
    """The streaming ingest stamps batch ids '{run_id}-{epoch}' with
    UNPADDED epoch numbers, so name order is unrelated to recency
    ('-10' sorts before '-2'). The keep_last window must protect the
    most recently WRITTEN dirs — ranking by name would consolidate the
    newest epochs (whose replay would then quarantine its own canonical
    keeper) while protecting stale ones."""
    import os
    import time

    from endtoend_etl_openmeteo_spark.operators.dedup import (
        compact_dedup_index,
        incremental_exact_dedup,
    )

    def batch(n):
        return _docs(spark, [(n * 10 + j, f"mtime batch {n} doc {j}")
                             for j in range(2)])

    # epochs 8..11 in WRITE order: names 'R-10','R-11' sort before 'R-8'
    for i, epoch in enumerate((8, 9, 10, 11)):
        incremental_exact_dedup(spark, batch(epoch), index_path, "doc_id",
                                "text", batch_id=f"R-{epoch}")
        # pin strictly increasing file mtimes regardless of FS resolution
        t = time.time() + i * 10
        d = Path(index_path) / f"batch=R-{epoch}"
        for p in d.iterdir():
            os.utime(p, (t, t))
    compact_dedup_index(spark, index_path, keep_last=2)
    dirs = sorted(p.name for p in Path(index_path).iterdir()
                  if p.name.startswith("batch="))
    # the two most recently WRITTEN epochs survive — 10 and 11, which
    # name-ranking would have doomed
    assert dirs == ["batch=R-10", "batch=R-11", "batch=__seg_000000"]
    assert spark.read.parquet(index_path).count() == 8


def test_compact_dedup_index_skips_fileless_dirs_in_merge_read(
    spark, index_path
):
    """A crashed batch that created its directory but committed no file
    is garbage-collected by the tick, never fed to the merge read."""
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        compact_dedup_index,
        incremental_exact_dedup,
    )

    incremental_exact_dedup(
        spark,
        _docs(spark, [(1, "alpha doc"), (2, "beta doc")]),
        index_path, "doc_id", "text", batch_id="b1",
    )
    (Path(index_path) / "batch=dead-1").mkdir()
    (Path(index_path) / "batch=dead-2").mkdir()
    res = compact_dedup_index(spark, index_path, keep_last=0)
    assert res["batches_merged"] == 3 and res["rows_merged"] == 2
    dirs = sorted(p.name for p in Path(index_path).iterdir()
                  if p.name.startswith("batch="))
    assert dirs == ["batch=__seg_000000"]


def test_minhash_bands_validates_divisibility():
    """bands must divide n_hashes and lie in [1, n_hashes]: a non-divisor
    silently weakened recall (trailing signature values ignored), an
    oversized bands built a zero-argument hash failing analysis."""
    import pytest
    from pyspark.sql import functions as F

    from endtoend_etl_openmeteo_spark.operators.dedup import minhash_bands

    with pytest.raises(ValueError, match="divide"):
        minhash_bands(F.col("sig"), n_hashes=32, bands=5)
    with pytest.raises(ValueError, match="divide"):
        minhash_bands(F.col("sig"), n_hashes=8, bands=16)
    with pytest.raises(ValueError, match="divide"):
        minhash_bands(F.col("sig"), n_hashes=32, bands=0)
    minhash_bands(F.col("sig"), n_hashes=32, bands=8)  # divisor: fine


def test_ngram_jaccard_thresholds_unrounded_value(spark):
    """The threshold applies to the UNROUNDED jaccard (the DuckDB
    oracle's ordering): a pair at 2/3 = 0.666666... with threshold
    0.66666669 must be excluded even though the ROUNDED value (0.666667)
    clears the threshold."""
    from endtoend_etl_openmeteo_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "x y z", "en"), (2, "x y", "en")],
        "doc_id long, text string, lang string",
    )
    over = ngram_jaccard_pairs(docs, "doc_id", "text", "lang",
                               threshold=0.66666669)
    assert over.count() == 0
    under = ngram_jaccard_pairs(docs, "doc_id", "text", "lang",
                                threshold=0.6666666)
    assert [tuple(r) for r in under.collect()] == [(1, 2, 0.666667)]


def test_cpu_parallelize_matches_plan_nodes_not_column_names(spark, tmp_path):
    """The width probe must match plan NODE names (line starts), not any
    'Sort'/'Window' token in the rendered plan — a COLUMN named Sort
    previously made a CPU-heavy single-partition scan skip
    parallelization silently."""
    from pyspark.sql import functions as F

    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    p = str(tmp_path / "one")
    spark.range(100).select(
        F.col("id"), F.col("id").alias("Sort"), F.col("id").alias("Window")
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() == 1
    out = cpu_parallelize(df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # a genuinely wide frame (real Aggregate node) still passes through
    agg = df.groupBy("Sort").count()
    assert cpu_parallelize(agg) is agg
