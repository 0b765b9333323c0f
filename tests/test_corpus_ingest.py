"""Streaming corpus ingest: continuous near-dup screening of a document
stream against the persistent MinHash index (run_streaming_corpus_ingest =
run_streaming_elt's exactly-once machinery x incremental_neardup)."""

import hashlib
import shutil
import uuid
from pathlib import Path

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.streaming import run_streaming_corpus_ingest

TMP = Path(__file__).resolve().parent.parent / ".tmp"

DOC_SCHEMA = "doc_id long, text string"

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away home "
    "tonight while the moon rises slowly over the quiet sleeping town"
)
OTHER = (
    "completely different content about spark engines and parquet files "
    "with columnar compression and predicate pushdown for analytic scans"
)
THIRD = (
    "unrelated text on streaming watermarks and stateful operators that "
    "bound the state store by evicting idle keys as event time advances"
)


@pytest.fixture()
def workdir():
    d = TMP / f"corpus_{uuid.uuid4().hex[:8]}"
    d.mkdir(parents=True, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _land(spark, landing: str, rows):
    """Append one landing file holding ``rows`` — one micro-batch's worth."""
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)


def _ids(spark, path):
    return sorted(r.doc_id for r in spark.read.parquet(path).collect())


def test_corpus_ingest_screens_batches_and_resumes_exactly_once(spark, workdir):
    landing = str(workdir / "landing")
    corpus = str(workdir / "corpus")
    index = str(workdir / "index")
    ckpt = str(workdir / "ckpt")
    quarantine = str(workdir / "quarantine")

    # batch A: three unique docs + one intra-batch near-dup of doc 1
    _land(
        spark,
        landing,
        [
            (1, BASE),
            (2, OTHER),
            (3, THIRD),
            (7, BASE.replace("quiet sleeping town", "quiet sleepy village")),
        ],
    )
    q = run_streaming_corpus_ingest(
        spark, landing, corpus, index, ckpt, DOC_SCHEMA,
        quarantine_path=quarantine,
    )
    q.awaitTermination(120)
    # intra-batch cluster keeps its smallest id: 7 quarantined, 1 kept
    assert _ids(spark, corpus) == [1, 2, 3]
    assert _ids(spark, quarantine) == [7]
    # every screened doc's signature is indexed — including the duplicate's,
    # so later copies of EITHER variant still match
    assert spark.read.parquet(index).count() == 4

    epoch0 = {
        r.doc_id: (r._run_id, r._epoch_id)
        for r in spark.read.parquet(corpus).collect()
    }

    # batch B: one fresh doc, one cross-batch near-dup of doc 2, and an
    # intra-batch near-dup pair (13 is a dup of 2; 14 is a dup of 13)
    near2 = OTHER.replace("analytic scans", "analytical scanning")
    _land(
        spark,
        landing,
        [
            (11, "a genuinely novel document with entirely fresh vocabulary here"),
            (13, near2),
            (14, near2 + " plus a tiny suffix"),
        ],
    )
    q2 = run_streaming_corpus_ingest(
        spark, landing, corpus, index, ckpt, DOC_SCHEMA,
        quarantine_path=quarantine,
    )
    q2.awaitTermination(120)

    assert _ids(spark, corpus) == [1, 2, 3, 11]
    assert _ids(spark, quarantine) == [7, 13, 14]
    # exactly-once on resume: batch A's corpus rows still carry their
    # original (run, epoch) partition — the resumed stream never re-wrote
    # or re-screened them
    after = {
        r.doc_id: (r._run_id, r._epoch_id)
        for r in spark.read.parquet(corpus).collect()
    }
    assert all(after[d] == epoch0[d] for d in (1, 2, 3))
    # no doc ever lands twice (content-level exactly-once)
    assert (
        spark.read.parquet(corpus).groupBy("doc_id").count()
        .filter(F.col("count") > 1).count() == 0
    )


def test_corpus_ingest_crash_after_index_write_is_idempotent(spark, workdir):
    """Kill-and-resume crash consistency at the nastiest point: the epoch
    dies AFTER its index subdir is written but BEFORE the corpus sink
    commits. The replayed epoch (same epoch id -> same batch_id) must
    exclude its own partial subdir from the 'already indexed' view — docs
    must NOT be flagged as duplicates of their own crashed attempt — and
    the final corpus must equal a clean one-shot run's."""
    from endtoend_etl_openmeteo_spark.operators.dedup import incremental_neardup

    landing = str(workdir / "landing")
    corpus = str(workdir / "corpus")
    index = str(workdir / "index")
    ckpt = str(workdir / "ckpt")
    quarantine = str(workdir / "quarantine")
    batch_a = [
        (1, BASE),
        (2, OTHER),
        (7, BASE.replace("quiet sleeping town", "quiet sleepy village")),
    ]
    _land(spark, landing, batch_a)

    # Flaky first attempt: reproduce run_streaming_corpus_ingest's screen
    # step (identical run_id derivation — the LINEAGE marker persisted in
    # the checkpoint dir, which a crash leaves intact — and batch_id
    # scheme, same checkpoint), then die before any sink write.
    from endtoend_etl_openmeteo_spark.streaming.pipeline import _lineage_run_id

    run_id = _lineage_run_id(spark, ckpt)

    def crash_after_index(batch, epoch_id):
        incremental_neardup(
            batch.sparkSession, batch, index, "doc_id", "text",
            batch_id=f"{run_id}-{int(epoch_id)}",
        )
        raise RuntimeError("injected crash between index write and sink commit")

    flaky = (
        spark.readStream.schema(DOC_SCHEMA).parquet(landing)
        .writeStream.foreachBatch(crash_after_index)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        flaky.awaitTermination(120)
    # the crash left the epoch-0 index subdir behind
    assert (Path(index) / f"batch={run_id}-0").exists()
    assert spark.read.parquet(index).count() == 3

    # Resume the REAL pipeline from the same checkpoint: epoch 0 replays.
    q = run_streaming_corpus_ingest(
        spark, landing, corpus, index, ckpt, DOC_SCHEMA,
        quarantine_path=quarantine,
    )
    q.awaitTermination(120)

    # Clean-run semantics: 1 and 2 in the corpus (NOT self-matched against
    # the crashed attempt's signatures), only the genuine intra-batch dup
    # quarantined, index still one signature per doc.
    assert _ids(spark, corpus) == [1, 2]
    assert _ids(spark, quarantine) == [7]
    idx = spark.read.parquet(index)
    assert idx.count() == 3
    assert idx.select("id").distinct().count() == 3
