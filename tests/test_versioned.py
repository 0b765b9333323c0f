"""Manifest-committed snapshots: time travel, snapshot-isolated compaction,
CAS commits, vacuum retention (operators/versioned.py)."""

import shutil
import uuid
from pathlib import Path

import pytest

from endtoend_etl_openmeteo_spark.operators.versioned import (
    latest_version,
    read_manifest,
    vt_append,
    vt_compact,
    vt_history,
    vt_init,
    vt_overwrite,
    vt_read,
    vt_vacuum,
)

TMP = Path(__file__).resolve().parent.parent / ".tmp"


@pytest.fixture()
def table(spark):
    d = TMP / f"vt_{uuid.uuid4().hex[:8]}"
    d.mkdir(parents=True, exist_ok=True)
    path = str(d)
    vt_init(spark, path)
    yield path
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_append_and_time_travel(spark, table):
    v1 = vt_append(spark, _df(spark, 0, 10), table)
    v2 = vt_append(spark, _df(spark, 10, 30), table)
    assert (v1, v2) == (1, 2)
    assert vt_read(spark, table).count() == 30  # latest
    assert vt_read(spark, table, version=v1).count() == 10  # time travel
    assert sorted(r.id for r in vt_read(spark, table, v1).collect()) == list(
        range(10)
    )


def test_overwrite_keeps_history(spark, table):
    vt_append(spark, _df(spark, 0, 10), table)
    v2 = vt_overwrite(spark, _df(spark, 100, 105), table)
    assert vt_read(spark, table).count() == 5
    assert vt_read(spark, table, version=1).count() == 10  # still there
    ops = [h["op"] for h in vt_history(spark, table)]
    assert ops == ["init", "append", "overwrite"]
    assert latest_version(spark, table) == v2


def test_compaction_is_snapshot_isolated(spark, table):
    # fragment: two appends, each written as 8 files
    vt_append(spark, _df(spark, 0, 1000).repartition(8), table)
    vt_append(spark, _df(spark, 1000, 2000).repartition(8), table)
    # a reader opens the pre-compaction snapshot and RESOLVES its plan
    old_reader = vt_read(spark, table, version=2)

    new_v, before, after = vt_compact(spark, table, target_mb=128)
    assert before == 16 and after == 1 and new_v == 3
    # compaction changed no visible data...
    assert vt_read(spark, table).count() == 2000
    # ...and the open reader still scans its own (old) files untouched
    assert old_reader.count() == 2000
    assert sorted(r.id for r in old_reader.collect()) == list(range(2000))
    # old version remains listed with its original files
    assert len(read_manifest(spark, table, 2)["files"]) == 16


def test_cas_commit_survives_a_lost_race(spark, table):
    import json

    vt_append(spark, _df(spark, 0, 10), table)
    # simulate a rival writer winning version 2: pre-create its manifest
    rival = {
        "version": 2,
        "parent": 1,
        "op": "append",
        "files": read_manifest(spark, table, 1)["files"],
    }
    (Path(table) / "_manifests" / "v00000002.json").write_text(json.dumps(rival))
    # our commit must NOT clobber v2 — rename refuses, we land on v3
    v = vt_append(spark, _df(spark, 10, 20), table)
    assert v == 3
    assert read_manifest(spark, table, 2) == rival  # untouched
    assert vt_read(spark, table).count() == 20


def test_vacuum_reclaims_only_unreferenced_files(spark, table):
    vt_append(spark, _df(spark, 0, 10), table)  # v1
    vt_append(spark, _df(spark, 10, 20), table)  # v2 (shares v1's files)
    vt_overwrite(spark, _df(spark, 50, 55), table)  # v3 (fresh files)
    n_files_before = len(list(Path(table).glob("data/*/*.parquet")))

    deleted = vt_vacuum(spark, table, keep_last=2)  # keeps v2, v3
    # v1's files are all referenced by v2 -> nothing deletable
    assert deleted == 0
    assert vt_read(spark, table, version=2).count() == 20

    deleted = vt_vacuum(spark, table, keep_last=1)  # keeps only v3
    assert deleted > 0
    n_files_after = len(list(Path(table).glob("data/*/*.parquet")))
    assert n_files_after == n_files_before - deleted
    assert vt_read(spark, table).count() == 5  # latest intact
    with pytest.raises(Exception):  # dropped version is gone
        vt_read(spark, table, version=2)
    with pytest.raises(ValueError, match="keep_last"):
        vt_vacuum(spark, table, keep_last=0)


def test_read_empty_version_raises_clearly(spark, table):
    with pytest.raises(ValueError, match="empty"):
        vt_read(spark, table, version=0)


def test_manifest_stats_prune_files(spark, table):
    from endtoend_etl_openmeteo_spark.operators.versioned import vt_files

    # four appends over disjoint id ranges, two files each, stats on id
    for lo in (0, 100, 200, 300):
        vt_append(
            spark, _df(spark, lo, lo + 100).repartition(2), table,
            stats_cols=["id"],
        )
    all_files = vt_files(spark, table)
    assert len(all_files) == 8

    # a range inside one append's ids must skip every other append's files
    pruned = vt_files(spark, table, prune=("id", 150, 160))
    assert 1 <= len(pruned) <= 2
    assert set(pruned) < set(all_files)
    got = vt_read(spark, table, prune=("id", 150, 160)).filter(
        "id BETWEEN 150 AND 160"
    )
    assert sorted(r.id for r in got.collect()) == list(range(150, 161))

    # pruned-to-nothing keeps the schema, returns no rows
    none = vt_read(spark, table, prune=("id", 10_000, 20_000))
    assert none.count() == 0 and none.columns == ["id", "v"]

    # compaction carries the recorded stats columns forward
    vt_compact(spark, table)
    latest = read_manifest(spark, table, latest_version(spark, table))
    assert all("id" in e["stats"] for e in latest["files"])
    # equality under pruning survives the rewrite
    again = vt_read(spark, table, prune=("id", 150, 160)).filter(
        "id BETWEEN 150 AND 160"
    )
    assert sorted(r.id for r in again.collect()) == list(range(150, 161))


def test_files_without_stats_are_conservatively_kept(spark, table):
    from endtoend_etl_openmeteo_spark.operators.versioned import vt_files

    vt_append(spark, _df(spark, 0, 50).repartition(1), table)  # no stats
    vt_append(
        spark, _df(spark, 50, 100).repartition(1), table, stats_cols=["id"]
    )
    pruned = vt_files(spark, table, prune=("id", 60, 70))
    # stats-less files can't be skipped; the stats-bearing out-of-range
    # file could only be the in-range one here, so: 1 unknown + 1 match
    assert len(pruned) == 2
    got = vt_read(spark, table, prune=("id", 60, 70)).filter(
        "id BETWEEN 60 AND 70"
    )
    assert got.count() == 11
