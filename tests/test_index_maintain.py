"""Stored-index compaction tick (operators/index_maintain.py):
fragmentation detection from directory metadata, partition-pruned
rewrite of only the fragmented partitions, right-sized output files,
byte-identical untouched partitions, sidecar survival."""

from pathlib import Path

from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.index_maintain import (
    compact_partitions,
    partition_file_counts,
)


def _files(root: str, part: str) -> list[str]:
    d = Path(root) / part
    return sorted(
        p.name
        for p in d.iterdir()
        if p.name.endswith(".parquet") and not p.name.startswith(("_", "."))
    )


def _layout(spark, path: str, frag_rows: int = 60):
    """part=0: one file (tidy). part=1: frag_rows files, one row each
    (the append-accretion disease)."""
    tidy = spark.range(10).select(
        F.lit(0).alias("part"), F.col("id"), (F.col("id") * 2).alias("v")
    )
    tidy.coalesce(1).write.partitionBy("part").mode("overwrite").parquet(path)
    for i in range(frag_rows):
        spark.range(1).select(
            F.lit(1).alias("part"),
            F.lit(100 + i).cast("long").alias("id"),
            F.lit(7 * i).cast("long").alias("v"),
        ).coalesce(1).write.partitionBy("part").mode("append").parquet(path)


def test_compact_rewrites_only_fragmented_partitions(spark, tmp_path):
    path = str(tmp_path / "idx")
    _layout(spark, path)
    before_tidy = _files(path, "part=0")
    counts = partition_file_counts(spark, path, "part")
    assert counts == {"0": 1, "1": 60}

    rows_before = sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "v", "part").collect()
    )
    stats = compact_partitions(spark, path, "part", max_files=4)
    assert stats == {
        "partitions_compacted": 1,
        "files_before": 60,
        "files_after": 1,
    }
    # tidy partition byte-untouched (same file names), fragmented now 1 file
    assert _files(path, "part=0") == before_tidy
    assert len(_files(path, "part=1")) == 1
    rows_after = sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "v", "part").collect()
    )
    assert rows_after == rows_before

    # second tick is a no-op
    assert compact_partitions(spark, path, "part", max_files=4) == {
        "partitions_compacted": 0,
        "files_before": 0,
        "files_after": 0,
    }


def test_compact_right_sizes_hot_partitions(spark, tmp_path):
    """A hot partition splits into ceil(rows/target) files, not one giant
    writer task — the 50M-vector-cell case in miniature."""
    path = str(tmp_path / "idx")
    _layout(spark, path, frag_rows=60)
    rows_before = sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "v", "part").collect()
    )
    stats = compact_partitions(
        spark, path, "part", max_files=4, target_rows_per_file=25
    )
    assert stats["partitions_compacted"] == 1
    # 60 rows / 25 per file -> 3 slots; hash slotting may merge slots that
    # land in one task but never exceeds the slot count
    n = len(_files(path, "part=1"))
    assert 1 <= n <= 3 and stats["files_after"] == n
    rows_after = sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "v", "part").collect()
    )
    assert rows_after == rows_before


def test_compact_preserves_root_sidecars(spark, tmp_path):
    path = str(tmp_path / "idx")
    _layout(spark, path, frag_rows=10)
    sidecar = Path(path) / "_stats.json"
    sidecar.write_text('{"n_docs": 1}')
    compact_partitions(spark, path, "part", max_files=4)
    assert sidecar.read_text() == '{"n_docs": 1}'
