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


def test_incremental_neardup_identical_text_estimates_one(spark, index_path):
    incremental_neardup(
        spark, _docs(spark, [(1, BASE)]), index_path, "doc_id", "text"
    )
    pairs = incremental_neardup(
        spark, _docs(spark, [(2, BASE)]), index_path, "doc_id", "text"
    ).collect()
    assert [(r.new_id, r.match_id, r.est_jaccard) for r in pairs] == [(2, 1, 1.0)]
