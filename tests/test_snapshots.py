"""SnapshotStore: Iceberg-style semantics over parquet + JSON manifests.

Covers the four contracts the north rule's table format needs: atomic
versioned commits, time travel + rollback, manifest/stats-based file
pruning (files Spark never lists), and sized output files.
"""

import os

import pytest
from pyspark.sql import functions as F

from verde_spark.sources.snapshots import SnapshotStore


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 97).alias("cell"),
        F.concat(F.lit("doc-"), F.col("id")).alias("url"),
    )


def test_append_and_time_travel(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"))
    assert store.current_version() == 0
    v1 = store.append(_df(spark, 0, 100))
    v2 = store.append(_df(spark, 100, 250))
    assert (v1, v2) == (1, 2)
    assert store.read(spark).count() == 250
    assert store.read(spark, version=1).count() == 100
    # history carries lineage + metrics
    hist = {r["version"]: r for r in store.history(spark).collect()}
    assert hist[2]["parent"] == 1
    assert hist[2]["operation"] == "append"
    assert hist[2]["n_rows"] == 250 and hist[2]["added_rows"] == 150


def test_overwrite_and_rollback(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"))
    store.append(_df(spark, 0, 100))
    store.overwrite(_df(spark, 500, 520))
    assert store.read(spark).count() == 20
    assert store.read(spark, version=1).count() == 100  # old still readable
    v3 = store.rollback(1)
    assert v3 == 3
    got = sorted(r["id"] for r in store.read(spark).collect())
    assert got == list(range(100))
    ops = [r["operation"] for r in store.history(spark).collect()]
    assert ops == ["append", "overwrite", "rollback:v1"]


def test_commit_is_atomic_and_guarded(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"))
    store.append(_df(spark, 0, 10))
    # CURRENT is a plain int swung by os.replace
    with open(os.path.join(store.snap_path, "CURRENT")) as fh:
        assert int(fh.read()) == 1
    # optimistic concurrency: stale expected parent refuses to commit
    with pytest.raises(RuntimeError, match="concurrent commit"):
        store._commit({"operation": "append", "files": []}, expected_parent=0)
    assert store.current_version() == 1  # nothing half-committed
    # check-then-act race (review r5): a second writer that passed the
    # CURRENT probe before the first swung it must LOSE on the exclusive
    # snapshot-file create, not truncate the winner's snapshot
    with open(os.path.join(store.snap_path, "v00000002.json"), "x") as fh:
        fh.write('{"winner": true}')
    with pytest.raises(RuntimeError, match="already written"):
        store._commit({"operation": "append", "files": []}, expected_parent=1)
    with open(os.path.join(store.snap_path, "v00000002.json")) as fh:
        assert fh.read() == '{"winner": true}'  # loser never clobbered it
    os.remove(os.path.join(store.snap_path, "v00000002.json"))


def test_stats_pruning_skips_files(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), stat_cols=["cell"])
    # range-partition on cell so each file owns a distinct cell range
    df = _df(spark, 0, 10_000).repartitionByRange(8, "cell")
    store.append(df)
    all_files = store.files()
    pruned = store.files(prune={"cell": (0, 5)})
    assert len(pruned) < len(all_files)  # manifest stats actually prune
    # superset guarantee: every matching row survives pruning
    full = store.read(spark).filter(F.col("cell") <= 5).count()
    got = store.read(spark, prune={"cell": (0, 5)}).filter(F.col("cell") <= 5)
    assert got.count() == full
    # and Spark's scan really touches fewer files
    touched = (
        store.read(spark, prune={"cell": (0, 5)})
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert touched == len(pruned)


def test_sized_output_files(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"))
    store.append(_df(spark, 0, 1000).coalesce(1), target_rows_per_file=100)
    snap = store._snapshot(1)
    assert len(snap["files"]) >= 10
    assert all(e["rows"] <= 100 for e in snap["files"])
    assert store.read(spark).count() == 1000


def test_expire_old_snapshots(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"))
    store.append(_df(spark, 0, 100))
    store.overwrite(_df(spark, 100, 150))  # v1 files now unreferenced by v2
    removed = store.expire(keep_from_version=2)
    assert removed > 0
    assert store.read(spark).count() == 50  # horizon unaffected
    with pytest.raises(Exception):
        store.read(spark, version=1).count()  # below horizon: gone


def test_empty_table_read_raises(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="empty table"):
        store.read(spark)
