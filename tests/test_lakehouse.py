"""Transactional guarantees of sinks/lakehouse.LakeTable: atomic
exclusive commits, optimistic-concurrency serialization of concurrent
writers, idempotent batch replay, crash debris tolerance, snapshot
isolation / time travel, and vacuum."""

from __future__ import annotations

import glob
import json
import os
import threading

import pytest

from etl_tool_rep_spark.sinks.lakehouse import CommitConflict, LakeTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v bigint")


@pytest.fixture
def table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        _mk(spark, [(1, 10), (2, 20), (3, 30)]))
    return t


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_create_and_read(table):
    assert table.version() == 1
    assert _rows(table.snapshot()) == [(1, 10), (2, 20), (3, 30)]


def test_create_twice_fails(spark, table):
    with pytest.raises(ValueError, match="already exists"):
        LakeTable.create(spark, table.root, _mk(spark, [(9, 9)]))


def test_merge_upsert_and_insert(spark, table):
    table.merge(_mk(spark, [(2, 99), (4, 40)]), "k", batch_id="b1")
    assert table.version() == 2
    assert _rows(table.snapshot()) == [(1, 10), (2, 99), (3, 30), (4, 40)]


def test_idempotent_replay_is_noop(spark, table):
    u = _mk(spark, [(2, 99)])
    table.merge(u, "k", batch_id="b1")
    v = table.version()
    table.merge(u, "k", batch_id="b1")           # replay: same batch_id
    table.merge(_mk(spark, [(2, -1)]), "k", batch_id="b1")  # even new data
    assert table.version() == v                  # no new snapshot
    assert _rows(table.snapshot()) == [(1, 10), (2, 99), (3, 30)]


def test_delete_where(spark, table):
    from pyspark.sql import functions as F
    table.delete_where(F.col("k") == 2, batch_id="d1")
    assert _rows(table.snapshot()) == [(1, 10), (3, 30)]


def test_time_travel_snapshots_immutable(spark, table):
    table.merge(_mk(spark, [(1, 11)]), "k", batch_id="b1")
    table.merge(_mk(spark, [(1, 12)]), "k", batch_id="b2")
    assert _rows(table.snapshot(1)) == [(1, 10), (2, 20), (3, 30)]
    assert _rows(table.snapshot(2)) == [(1, 11), (2, 20), (3, 30)]
    assert _rows(table.snapshot(3)) == [(1, 12), (2, 20), (3, 30)]
    hist = table.history()
    assert [m["parent"] for m in hist] == [0, 1, 2]
    assert [m["batch_id"] for m in hist] == ["create", "b1", "b2"]


def test_concurrent_writers_serialize(spark, table):
    """Two threads merging different keys concurrently: both commits
    must land (no lost update), in SOME serial order."""
    errs = []

    def writer(key, val, bid):
        try:
            table.merge(_mk(spark, [(key, val)]), "k", batch_id=bid)
        except Exception as e:                    # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(10 + i, 100 + i, f"c{i}"))
          for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert table.version() == 5                   # create + 4 commits
    got = dict(_rows(table.snapshot()))
    for i in range(4):
        assert got[10 + i] == 100 + i             # every update survived


def test_exclusive_version_claim(spark, table):
    """Publishing the same version twice must fail for the loser —
    the os.link commit primitive is exclusive."""
    base = table.snapshot(1)
    table._commit(base, batch_id="x1", parent=table.version())
    with pytest.raises(CommitConflict):
        table._commit(base, batch_id="x2", parent=table.version() - 1)


def test_crash_debris_is_ignored(spark, table):
    """A writer that died after writing data files but before linking
    its manifest leaves debris that readers and later writers must
    ignore."""
    # orphan data dir (crash between steps 1 and 3)
    orphan = os.path.join(table.root, "data", "deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as fh:
        fh.write(b"not a real parquet file")
    # orphan manifest temp (crash during step 2/3)
    with open(os.path.join(table.root, "_manifest", ".tmp-dead.json"),
              "w") as fh:
        json.dump({"version": 99}, fh)
    assert table.version() == 1
    assert _rows(table.snapshot()) == [(1, 10), (2, 20), (3, 30)]
    table.merge(_mk(spark, [(4, 40)]), "k", batch_id="b1")
    assert table.version() == 2
    # vacuum clears the orphaned data dir (not referenced anywhere)
    removed = table.vacuum(keep_last=2)
    assert orphan in removed


def test_vacuum_keeps_live_versions_readable(spark, table):
    table.merge(_mk(spark, [(1, 11)]), "k", batch_id="b1")
    table.merge(_mk(spark, [(1, 12)]), "k", batch_id="b2")
    removed = table.vacuum(keep_last=2)
    assert removed                                 # v1's files went away
    assert _rows(table.snapshot(2)) == [(1, 11), (2, 20), (3, 30)]
    assert _rows(table.snapshot(3)) == [(1, 12), (2, 20), (3, 30)]


def test_append(spark, table):
    table.append(_mk(spark, [(7, 70)]), batch_id="a1")
    assert _rows(table.snapshot()) == [(1, 10), (2, 20), (3, 30), (7, 70)]


def test_schema_mismatch_rejected(spark, table):
    bad = spark.createDataFrame([(1, 1)], "k bigint, other bigint")
    with pytest.raises(ValueError, match="schema mismatch"):
        table.merge(bad, "k", batch_id="s1")
    assert table.version() == 1                   # nothing committed


def test_no_tmp_manifest_left_behind(spark, table):
    table.merge(_mk(spark, [(5, 50)]), "k", batch_id="b1")
    assert not glob.glob(os.path.join(table.root, "_manifest", ".tmp-*"))
