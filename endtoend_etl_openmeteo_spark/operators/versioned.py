"""Minimal table format: manifest-committed snapshots over plain Parquet
(SURVEY.md §4 scale extension — the reader-isolation gap
``operators/layout.compact`` documents).

Without a table format, every in-place rewrite (compaction, overwrite,
merge) has a window where concurrent readers see half a table — at 100 TB,
where compaction runs continuously, that is a standing correctness hazard.
The industry fix (Iceberg/Delta, re-derived here from the published
designs, not their code) is a tiny commit protocol:

- data files are IMMUTABLE, written once under ``data/``;
- a snapshot is a MANIFEST: one small JSON listing exactly the files that
  make up a version;
- commit = write manifest to a temp name, then RENAME to
  ``_manifests/v%08d.json``. Hadoop's rename refuses to replace an
  existing destination, so the version namespace is a compare-and-swap:
  two racing writers produce two consecutive versions, never a torn one;
- readers resolve a manifest ONCE and scan only its files — a concurrent
  compaction commits a new version without touching the files an open
  reader holds (snapshot isolation), and any historical version stays
  queryable until vacuumed (time travel);
- ``vacuum`` deletes files referenced by NO retained manifest — the only
  destructive step, explicitly separated from commit.

Scale notes: the manifest lists file paths (KBs per thousand files — at
true 100 TB scale Iceberg splits manifests hierarchically; one level is
enough here and the protocol is identical). Commit cost is O(1) renames;
concurrent-writer conflict cost is one manifest re-read + retry.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _write_file(spark: SparkSession, path: str, payload: bytes) -> None:
    fs, jvm = _fs(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    out.write(bytearray(payload))
    out.close()


def _read_file(spark: SparkSession, path: str) -> bytes:
    fs, jvm = _fs(spark, path)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        # commons-io ships with Hadoop; py4j passes primitive arrays by
        # value, so a read(buf) loop can't work from Python
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def _rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, jvm = _fs(spark, src)
    return bool(
        fs.rename(
            jvm.org.apache.hadoop.fs.Path(src), jvm.org.apache.hadoop.fs.Path(dst)
        )
    )


def _manifest_path(table: str, version: int) -> str:
    return f"{table.rstrip('/')}/{_MANIFEST_DIR}/v{version:08d}.json"


def _list_versions(spark: SparkSession, table: str) -> list[int]:
    mdir = f"{table.rstrip('/')}/{_MANIFEST_DIR}"
    fs, jvm = _fs(spark, mdir)
    hdir = jvm.org.apache.hadoop.fs.Path(mdir)
    if not fs.exists(hdir):
        return []
    versions = []
    for status in fs.listStatus(hdir):
        name = status.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                versions.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(versions)


def read_manifest(spark: SparkSession, table: str, version: int) -> dict:
    return json.loads(_read_file(spark, _manifest_path(table, version)))


def latest_version(spark: SparkSession, table: str) -> int:
    versions = _list_versions(spark, table)
    if not versions:
        raise FileNotFoundError(f"not a versioned table (no manifests): {table}")
    return versions[-1]


def _commit(
    spark: SparkSession, table: str, files: list[str], op: str, parent_hint: int
) -> int:
    """CAS-commit a manifest: try version = latest+1; on rename refusal
    (another writer won that slot) re-read latest and retry."""
    table = table.rstrip("/")
    attempt = parent_hint + 1
    for _ in range(100):
        manifest = {
            "version": attempt,
            "parent": attempt - 1,
            "op": op,
            "files": sorted(files),
        }
        tmp = f"{table}/{_MANIFEST_DIR}/_tmp_{uuid.uuid4().hex}.json"
        _write_file(spark, tmp, json.dumps(manifest).encode())
        if _rename(spark, tmp, _manifest_path(table, attempt)):
            return attempt
        # lost the race: drop the temp, rebase on the new latest
        fs, jvm = _fs(spark, tmp)
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), False)
        attempt = latest_version(spark, table) + 1
    raise RuntimeError(f"commit contention: 100 failed CAS attempts on {table}")


def _write_data(spark: SparkSession, df: DataFrame, table: str) -> list[str]:
    """Materialize ``df`` as immutable files under data/<uuid>/ and return
    their table-relative paths."""
    table = table.rstrip("/")
    subdir = f"{_DATA_DIR}/{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(f"{table}/{subdir}")
    fs, jvm = _fs(spark, table)
    listed = fs.listStatus(jvm.org.apache.hadoop.fs.Path(f"{table}/{subdir}"))
    return [
        f"{subdir}/{s.getPath().getName()}"
        for s in listed
        if s.getPath().getName().endswith(".parquet")
    ]


def vt_init(spark: SparkSession, table: str) -> int:
    """Create an empty versioned table (version 0, no files)."""
    fs, jvm = _fs(spark, table)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(f"{table.rstrip('/')}/{_MANIFEST_DIR}"))
    return _commit(spark, table, [], "init", parent_hint=-1)


def vt_append(spark: SparkSession, df: DataFrame, table: str) -> int:
    """Append ``df`` as a new snapshot: parent's files + the new files."""
    files = _write_data(spark, df, table)
    parent = latest_version(spark, table)
    existing = read_manifest(spark, table, parent)["files"]
    return _commit(spark, table, existing + files, "append", parent)


def vt_overwrite(spark: SparkSession, df: DataFrame, table: str) -> int:
    """Replace the table contents in one snapshot (the atomic form of
    ``mode('overwrite')`` — readers of older versions are untouched)."""
    files = _write_data(spark, df, table)
    parent = latest_version(spark, table)
    return _commit(spark, table, files, "overwrite", parent)


def vt_read(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: resolve ONE manifest, scan exactly its files.
    ``version=None`` -> latest. The returned plan never re-lists the
    directory, so concurrent commits/compactions cannot tear it."""
    table = table.rstrip("/")
    v = latest_version(spark, table) if version is None else version
    manifest = read_manifest(spark, table, v)
    files = [f"{table}/{f}" for f in manifest["files"]]
    if not files:
        raise ValueError(f"version {v} of {table} is empty — nothing to scan")
    return spark.read.parquet(*files)


def vt_compact(
    spark: SparkSession, table: str, target_mb: int = 128
) -> tuple[int, int, int]:
    """Small-file compaction as a SNAPSHOT: read the current version,
    rewrite into ceil(bytes/target) files, commit a new manifest. Old
    files stay on disk for older versions — open readers are isolated;
    space is reclaimed by :func:`vt_vacuum`, not by compaction.

    Returns (new_version, files_before, files_after).
    """
    import math

    table = table.rstrip("/")
    parent = latest_version(spark, table)
    manifest = read_manifest(spark, table, parent)
    if not manifest["files"]:
        return parent, 0, 0
    fs, jvm = _fs(spark, table)
    total = sum(
        fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(f"{table}/{f}")).getLen()
        for f in manifest["files"]
    )
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(*[f"{table}/{f}" for f in manifest["files"]])
    files = _write_data(spark, df.repartition(n), table)
    new_v = _commit(spark, table, files, "compact", parent)
    return new_v, len(manifest["files"]), len(files)


def vt_history(spark: SparkSession, table: str) -> list[dict]:
    """[{version, op, n_files}] for every retained manifest, oldest first."""
    return [
        {
            "version": v,
            "op": (m := read_manifest(spark, table, v))["op"],
            "n_files": len(m["files"]),
        }
        for v in _list_versions(spark, table)
    ]


def vt_vacuum(spark: SparkSession, table: str, keep_last: int = 2) -> int:
    """Drop all but the newest ``keep_last`` manifests and delete every
    data file no retained manifest references. The ONLY destructive
    operation in the protocol; run it with a retention window longer than
    the longest-running reader. Returns the number of files deleted."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the latest version must survive)")
    table = table.rstrip("/")
    versions = _list_versions(spark, table)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    referenced = set()
    for v in keep:
        referenced.update(read_manifest(spark, table, v)["files"])
    doomed = set()
    for v in drop:
        doomed.update(read_manifest(spark, table, v)["files"])
    doomed -= referenced
    fs, jvm = _fs(spark, table)
    for f in sorted(doomed):
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{table}/{f}"), False)
    for v in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(_manifest_path(table, v)), False)
    return len(doomed)
