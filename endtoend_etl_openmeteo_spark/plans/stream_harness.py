"""Shared scaffolding for the streaming parity harnesses (q_stream_window,
q_stream_join, q_corpus_ingest, q_ann_stream_ingest): wave-ordered landing
files and a timeout-honest availableNow→parquet lifecycle. One copy by
design — the mtime-stamping subtlety (FileStreamSource orders by
modification time; coarse filesystem granularity can co-batch separately
written waves) and the awaitTermination contract (it returns False on
timeout instead of raising) had already drifted between hand-rolled
copies.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession


def stamp_wave_mtimes(dirs: list[str], waves: list[set]) -> None:
    """Pin micro-batch order across landing dirs: files are stamped with
    strictly increasing mtimes per WAVE (10 s apart), so
    ``maxFilesPerTrigger=1`` provably consumes wave i before wave i+1.

    ``waves`` holds cumulative (dir, filename) snapshots taken AFTER each
    wave landed, except the final wave, which is implied: a file absent
    from every snapshot belongs to wave ``len(waves)``.
    """
    now = time.time()
    for d in dirs:
        for f in os.listdir(d):
            if f.startswith("_"):
                continue
            idx = next(
                (i for i, w in enumerate(waves) if (d, f) in w), len(waves)
            )
            t = now + 10 * idx
            os.utime(f"{d}/{f}", (t, t))


def run_stream_to_parquet(
    spark: SparkSession,
    result: DataFrame,
    out: str,
    checkpoint: str,
    shuffle_partitions: int = 4,
    timeout_s: int = 600,
) -> None:
    """Run ``result`` availableNow into a parquet sink and WAIT HONESTLY:
    ``awaitTermination(timeout)`` returns False on expiry rather than
    raising, and silently proceeding would snapshot a partially-written
    sink and rmtree the landing dirs under a still-running query — so a
    timeout stops the query and raises.

    State partitions are pinned small for the harness lifetime: the
    partition count is fixed at checkpoint creation, every micro-batch
    commits one state store per partition (per join side), and these
    fresh-checkpoint proofs run a handful of micro-batches over bounded
    slices. A production deployment sizes this to key cardinality.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            result.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"streaming harness exceeded {timeout_s}s before the "
                "availableNow run drained — partial sink discarded"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def await_or_raise(q, timeout_s: int = 600) -> None:
    """awaitTermination that treats expiry as the error it is (see
    run_stream_to_parquet) — for harnesses that build their own sink."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming harness exceeded {timeout_s}s before the "
            "availableNow run drained"
        )
