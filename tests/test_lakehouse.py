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


# -- file-granular commit planning (round-5 verdict items #3/#4) ------


def _paths(table, v=None):
    m = table._manifest(table.version() if v is None else v)
    return {e["path"] for e in m["files"]}


@pytest.fixture
def clustered(spark, tmp_path):
    """1..1000 range-clustered on k into 8 files with disjoint ranges."""
    from pyspark.sql import functions as F
    df = (spark.range(1, 1001)
          .select(F.col("id").alias("k"), (F.col("id") * 10).alias("v")))
    return LakeTable.create(spark, str(tmp_path / "t"), df,
                            cluster_by="k", num_files=8)


def test_merge_carries_untouched_files_by_reference(spark, clustered):
    """A merge touching keys [5, 7] must rewrite ONLY the file(s) whose
    footer range covers those keys; every other file's path is
    IDENTICAL across the commit (zero IO on 100-TB cold data)."""
    t = clustered
    before = t._manifest(1)
    assert len(before["files"]) >= 4
    must_carry = {
        e["path"] for e in before["files"]
        if e["stats"]["k"]["max"] < 5 or e["stats"]["k"]["min"] > 7}
    assert must_carry                              # pruning has teeth
    t.merge(_mk(spark, [(5, -5), (7, -7), (2000, 1)]), "k", batch_id="b1")
    after = _paths(t)
    assert must_carry <= after                     # carried by reference
    rewritten = _paths(t, 1) - after
    assert len(rewritten) <= len(before["files"]) - len(must_carry)
    got = dict(_rows(t.snapshot()))
    assert got[5] == -5 and got[7] == -7 and got[6] == 60
    assert got[2000] == 1                          # new key inserted
    assert len(got) == 1001


def test_merge_range_overlap_but_no_hit_prunes(spark, clustered):
    """Phase-2 pruning: update keys 5000/6000 overlap no file's range
    after phase 1; even an update key INSIDE a file's [min,max] gap
    that matches no row leaves the file untouched when the exact scan
    finds no hit — here every file must carry by reference."""
    t = clustered
    before = _paths(t, 1)
    t.merge(_mk(spark, [(5000, 1), (6000, 2)]), "k", batch_id="b1")
    after = _paths(t)
    assert before <= after                         # all carried
    assert len(after) == len(before) + 1           # + the insert file(s)


def test_append_is_zero_rewrite(spark, clustered):
    t = clustered
    before = _paths(t, 1)
    t.append(_mk(spark, [(9999, 1)]), batch_id="a1")
    assert before <= _paths(t)                     # nothing rewritten
    assert dict(_rows(t.snapshot()))[9999] == 1


def test_delete_rewrites_only_matching_files(spark, clustered):
    t = clustered
    from pyspark.sql import functions as F
    before = t._manifest(1)
    t.delete_where(F.col("k") == 500, batch_id="d1")
    after = _paths(t)
    carried = {e["path"] for e in before["files"]
               if not (e["stats"]["k"]["min"] <= 500
                       <= e["stats"]["k"]["max"])}
    assert carried <= after
    assert len(_paths(t, 1) - after) == len(before["files"]) - len(carried)
    assert 500 not in dict(_rows(t.snapshot()))
    assert len(_rows(t.snapshot())) == 999


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE semantics: only predicate-TRUE rows go; rows where
    the predicate evaluates to NULL must SURVIVE (Delta/Iceberg
    behavior — a bare ~condition filter would wrongly drop them)."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(1, 10), (2, None), (3, 30)],
                               "k bigint, v bigint")
    t = LakeTable.create(spark, str(tmp_path / "t"), df)
    t.delete_where(F.col("v") < 20, batch_id="d1")
    assert _rows(t.snapshot()) == [(2, None), (3, 30)]


def test_delete_all_leaves_readable_empty_snapshot(spark, table):
    """A commit that empties the table must stay readable (typed empty
    frame, not a pathless read error) and writable afterwards."""
    from pyspark.sql import functions as F
    table.delete_where(F.lit(True), batch_id="d1")
    snap = table.snapshot()
    assert snap.count() == 0
    assert set(snap.columns) == {"k", "v"}
    table.append(_mk(spark, [(9, 90)]), batch_id="a1")
    assert _rows(table.snapshot()) == [(9, 90)]


def test_compact_bin_packs_small_files_only(spark, clustered):
    """10 tiny appended files + the 8 clustered base files: compaction
    must merge every below-threshold file into few outputs, carry any
    right-sized file by reference, keep rows identical, and replay
    idempotently under the same batch_id."""
    t = clustered
    for i in range(10):
        t.append(_mk(spark, [(2000 + i, i)]), batch_id=f"a{i}")
    before_rows = _rows(t.snapshot())
    n_before = len(_paths(t))
    assert n_before >= 18
    v = t.compact(batch_id="opt1", target_file_bytes=1 << 20)
    assert len(_paths(t)) < n_before            # net shrink
    assert _rows(t.snapshot()) == before_rows   # rows untouched
    t.compact(batch_id="opt1")                  # idempotent replay
    assert t.version() == v
    # stats survive: a post-compaction merge still prunes by range
    m = t._manifest(t.version())
    assert any(e["stats"].get("k") for e in m["files"])


def test_compact_noop_when_nothing_to_gain(spark, table):
    v = table.version()
    table.compact(batch_id="opt1", target_file_bytes=1)  # all "big"
    assert _rows(table.snapshot()) == [(1, 10), (2, 20), (3, 30)]
    assert table.version() == v + 1             # commit recorded (audit)


def test_pruned_merge_matches_full_merge_semantics(spark, tmp_path):
    """Differential: the file-granular merge (footer-stat pruning +
    carry-by-reference) must produce EXACTLY the rows a whole-snapshot
    merge_upsert would — across adversarial key layouts: update keys
    inside/outside/straddling file ranges, NULL keys on both sides,
    empty updates, and inserts beyond every range."""
    cases = [
        # (base keys, update (k, v) pairs)
        (list(range(1, 101)), [(5, -5), (99, -99), (500, 1)]),
        (list(range(1, 101)), [(None, -1), (50, -50)]),
        ([1, 2, 3, None], [(None, -1), (3, -3)]),
        (list(range(1, 101)), []),
        ([10, 20, 30], [(1, -1), (40, -40)]),      # all outside ranges
        (list(range(1, 101)), [(k, -k) for k in range(1, 101)]),
    ]
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.LongType())])
    for i, (base_keys, ups) in enumerate(cases):
        base = spark.createDataFrame(
            [(k, (k or 0) * 10) for k in base_keys], schema)
        updates = spark.createDataFrame(ups, schema)
        t = LakeTable.create(spark, str(tmp_path / f"t{i}"), base,
                             cluster_by="k", num_files=4)
        t.merge(updates, "k", batch_id="b")
        got = sorted(map(tuple, t.snapshot().collect()),
                     key=lambda r: (r[0] is None, r[0]))
        from etl_tool_rep_spark.operators.merge import merge_upsert
        want = sorted(map(tuple, merge_upsert(base, updates,
                                              ["k"]).collect()),
                      key=lambda r: (r[0] is None, r[0]))
        assert got == want, f"case {i}: {got} != {want}"


def test_commit_reads_constant_manifests(spark, table):
    """Commit cost must be independent of table history: the cumulative
    batch-id set rides in the latest manifest, so a transact reads
    exactly one manifest file no matter how many commits precede it."""
    for i in range(25):
        table.append(_mk(spark, [(100 + i, i)]), batch_id=f"a{i}")
    reads = []
    orig = table._manifest
    table._manifest = lambda v: (reads.append(v), orig(v))[1]
    table.merge(_mk(spark, [(1, -1)]), "k", batch_id="final")
    assert len(reads) == 1                         # latest only
    table._manifest = orig
    assert table.batch_ids() >= (
        {f"a{i}" for i in range(25)} | {"create", "final"})


# -- ADVICE round-6 regressions ---------------------------------------


def test_delete_under_percent_encoded_root(spark, tmp_path):
    """ADVICE r6 #1 (high): input_file_name() returns percent-encoded
    file:// URIs, so a table root containing a space used to make every
    file look untouched and the DELETE silently committed nothing."""
    from pyspark.sql import functions as F
    root = str(tmp_path / "space probe" / "t")
    t = LakeTable.create(
        spark, root, _mk(spark, [(1, 10), (2, 20), (3, 30)]))
    t.delete_where(F.col("k") == 2, batch_id="d1")
    assert _rows(t.snapshot()) == [(1, 10), (3, 30)]


def test_nan_float_merge_key_no_duplicates(spark, tmp_path):
    """ADVICE r6 #2 (medium): a NaN double merge key escaped both
    pruning phases (driver NaN comparisons are False; between() never
    matches NaN), so the file holding the matching NaN row was carried
    by reference while the NaN update inserted — duplicate keys. Floats
    are now excluded from stats pruning: merge must match whole-snapshot
    merge_upsert (eqNullSafe: NaN == NaN) exactly."""
    nan = float("nan")
    df = spark.createDataFrame(
        [(1.0, 10), (2.0, 20), (nan, -1)], "k double, v bigint")
    t = LakeTable.create(spark, str(tmp_path / "t"), df,
                         cluster_by="k", num_files=3)
    t.merge(spark.createDataFrame([(nan, 99)], "k double, v bigint"),
            "k", batch_id="b1")
    import math
    got = sorted(((r["k"], r["v"]) for r in t.snapshot().collect()),
                 key=lambda p: (math.isnan(p[0]), p[0], p[1]))
    norm = [("nan" if math.isnan(k) else k, v) for k, v in got]
    assert norm == [(1.0, 10), (2.0, 20), ("nan", 99)]


def test_legacy_manifest_readable_and_upgradable(spark, tmp_path):
    """ADVICE r6 #3 (low): pre-rewrite manifests store ``files`` as
    plain path strings and lack ``batch_ids``/``schema``. They must
    stay readable (snapshot / batch_ids) and writable — the next
    commit publishes the modern format."""
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, _mk(spark, [(1, 10), (2, 20)]),
                         batch_id="create")
    # rewrite v1 on disk in the legacy shape
    m_path = os.path.join(root, "_manifest", "v000000000001.json")
    with open(m_path) as fh:
        m = json.load(fh)
    legacy = {"version": 1, "parent": 0, "batch_id": "create",
              "files": [e["path"] for e in m["files"]],
              "committed_at": m["committed_at"]}
    os.unlink(m_path)
    with open(m_path, "w") as fh:
        json.dump(legacy, fh)
    t2 = LakeTable(spark, root)
    assert _rows(t2.snapshot()) == [(1, 10), (2, 20)]
    assert t2.batch_ids() == {"create"}
    t2.append(_mk(spark, [(3, 30)]), batch_id="a1")
    assert _rows(t2.snapshot()) == [(1, 10), (2, 20), (3, 30)]
    with open(os.path.join(root, "_manifest",
                           "v000000000002.json")) as fh:
        modern = json.load(fh)
    assert "schema" in modern and "batch_ids" in modern
    assert isinstance(modern["files"][0], dict)


def test_schema_type_drift_rejected_at_commit(spark, table):
    """ADVICE r6 #4 (low): same names but different types must be
    rejected at commit time, not discovered at a later read."""
    bad = spark.createDataFrame([("9", 90)], "k string, v bigint")
    with pytest.raises(ValueError, match="type mismatch"):
        table.append(bad, batch_id="bad")
    with pytest.raises(ValueError, match="type mismatch"):
        table.merge(bad, "k", batch_id="bad2")


# --- read-path data skipping (round-7 verdict item #7) ---------------

def test_read_where_skips_files(spark, clustered):
    """A point/range read on the cluster key must open only the files
    whose footer [min,max] can contain matches — file-count asserted,
    results row-identical to the full-scan filter."""
    t = clustered
    kept, total = t.pruned_files([("k", "between", (100, 120))])
    assert total == 8
    assert 1 <= len(kept) < total
    got = sorted(r["k"] for r in
                 t.read_where([("k", "between", (100, 120))]).collect())
    assert got == list(range(100, 121))

    kept_eq, _ = t.pruned_files([("k", "=", 500)])
    assert len(kept_eq) == 1
    rows = t.read_where([("k", "=", 500)]).collect()
    assert len(rows) == 1 and rows[0]["v"] == 5000


def test_read_where_matches_snapshot_filter(spark, clustered):
    """Pruned read == snapshot().filter(...) for every supported op."""
    from pyspark.sql import functions as F
    t = clustered
    cases = [
        ([("k", "<", 50)], F.col("k") < 50),
        ([("k", ">=", 950)], F.col("k") >= 950),
        ([("k", "in", [3, 400, 999])], F.col("k").isin([3, 400, 999])),
        ([("k", ">", 200), ("k", "<=", 260)],
         (F.col("k") > 200) & (F.col("k") <= 260)),
    ]
    for conds, col in cases:
        got = sorted(r["k"] for r in t.read_where(conds).collect())
        want = sorted(r["k"] for r in
                      t.snapshot().filter(col).collect())
        assert got == want, conds


def test_read_where_no_match_returns_typed_empty(spark, clustered):
    df = clustered.read_where([("k", ">", 10_000)])
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]
    # all 8 files pruned — nothing opened
    kept, _ = clustered.pruned_files([("k", ">", 10_000)])
    assert kept == []


def test_read_where_unclustered_column_keeps_all_files(spark, clustered):
    """Conditions on non-stat columns skip no files but still filter
    rows exactly (conservative fallback)."""
    t = clustered
    kept, total = t.pruned_files([("v", "=", 5000)])
    assert len(kept) == total
    rows = t.read_where([("v", "=", 5000)]).collect()
    assert len(rows) == 1 and rows[0]["k"] == 500


def test_read_where_stats_survive_merge(spark, clustered):
    """After a file-granular merge, the carried + rewritten files both
    keep prunable stats: a disjoint-range read still skips files."""
    from pyspark.sql import functions as F
    t = clustered
    ups = spark.createDataFrame([(5, -1), (7, -2)], ["k", "v"])
    t.merge(ups, "k", batch_id="m1")
    kept, total = t.pruned_files([("k", "between", (900, 950))])
    assert len(kept) < total
    got = {r["k"]: r["v"] for r in
           t.read_where([("k", "in", [5, 7, 900])]).collect()}
    assert got == {5: -1, 7: -2, 900: 9000}


# -- z-order clustering (round-8 verdict item #6) ---------------------


def _grid_table(spark, root, mode):
    """64x64 integer grid written as 16 files under the given layout."""
    from pyspark.sql import functions as F
    df = (spark.range(64 * 64)
          .select((F.col("id") % 64).alias("x"),
                  (F.col("id") / 64).cast("bigint").alias("y"),
                  F.col("id").alias("payload")))
    return LakeTable.create(spark, root, df, cluster_by=["x", "y"],
                            num_files=16, cluster_mode=mode)


def test_zorder_prunes_on_second_dimension(spark, tmp_path):
    """The lexicographic range layout leads on x, so every file spans
    the FULL y range and a y-only predicate prunes nothing; the
    z-order layout keeps tight per-file stats on BOTH columns and
    must open strictly fewer files for the same predicate."""
    rng = _grid_table(spark, str(tmp_path / "r"), "range")
    zod = _grid_table(spark, str(tmp_path / "z"), "zorder")
    cond = [("y", "between", (10, 13))]
    kept_r, total_r = rng.pruned_files(cond)
    kept_z, total_z = zod.pruned_files(cond)
    assert total_r == total_z == 16
    assert len(kept_z) < len(kept_r), (len(kept_z), len(kept_r))
    # and the 2-D rectangle prunes harder still under z-order
    rect = [("x", "between", (10, 13)), ("y", "between", (10, 13))]
    kept_r2, _ = rng.pruned_files(rect)
    kept_z2, _ = zod.pruned_files(rect)
    assert len(kept_z2) < len(kept_r2) or \
        (len(kept_z2) <= 2 and len(kept_r2) <= 2)
    assert len(kept_z2) < total_z


def test_zorder_read_where_row_exact(spark, tmp_path):
    """Pruned z-order reads must equal the full-scan filter row for
    row — skipping can never change results."""
    from pyspark.sql import functions as F
    t = _grid_table(spark, str(tmp_path / "z"), "zorder")
    conds = [("x", "between", (5, 9)), ("y", "between", (20, 40))]
    got = sorted((r["x"], r["y"]) for r in t.read_where(conds).collect())
    want = sorted((r["x"], r["y"]) for r in t.snapshot().filter(
        F.col("x").between(5, 9) & F.col("y").between(20, 40))
        .collect())
    assert got == want and got


def test_zorder_mode_survives_merge(spark, tmp_path):
    """cluster_mode persists in the manifest; a merge rewrite keeps
    the z layout (2-D pruning still bites afterwards)."""
    t = _grid_table(spark, str(tmp_path / "z"), "zorder")
    ups = spark.createDataFrame([(3, 3, -1), (40, 40, -2)],
                                ["x", "y", "payload"])
    t.merge(ups, "x", batch_id="m1")
    assert t._manifest(t.version())["cluster_mode"] == "zorder"
    kept, total = t.pruned_files([("y", "between", (10, 13))])
    assert len(kept) < total
    got = {(r["x"], r["y"]): r["payload"] for r in
           t.read_where([("x", "in", [3, 40])]).collect()
           if (r["x"], r["y"]) in {(3, 3), (40, 40)}}
    assert got == {(3, 3): -1, (40, 40): -2}


def test_zorder_unknown_mode_rejected(spark, tmp_path):
    import pytest as _pytest
    df = _mk(spark, [(1, 1)])
    with _pytest.raises(ValueError, match="cluster_mode"):
        LakeTable.create(spark, str(tmp_path / "t"), df,
                         cluster_by="k", cluster_mode="hilbert")


def test_zorder_skips_unorderable_cluster_columns(spark, tmp_path):
    """A cluster column with no exploitable ordering (array) can't
    steer the Morton key; z-order must skip it (integer key still
    prunes) instead of crashing."""
    from pyspark.sql import functions as F
    df = (spark.range(100)
          .select(F.col("id").alias("k"),
                  F.array(F.col("id") % 7).alias("tags")))
    t = LakeTable.create(spark, str(tmp_path / "t"), df,
                         cluster_by=["k", "tags"], num_files=4,
                         cluster_mode="zorder")
    kept, total = t.pruned_files([("k", "between", (0, 10))])
    assert len(kept) < total
    assert t.snapshot().count() == 100


# -- typed z-order keys (round-9 verdict item #2) ---------------------
# Real 100 TB tables cluster on (date, id) or (domain, hash); dates
# map through epoch days and strings through an ordered bounded
# dictionary, so BOTH dimensions steer the curve and both prune.


def _typed_grid_table(spark, root, mode):
    """64 days x 64 domains written as 16 files under the layout:
    d = 2020-01-01 + (id % 64) days, dom = 'dom%02d' of id/64."""
    from pyspark.sql import functions as F
    df = (spark.range(64 * 64)
          .select(F.date_add(F.lit("2020-01-01").cast("date"),
                             (F.col("id") % 64).cast("int"))
                  .alias("d"),
                  F.format_string("dom%02d",
                                  (F.col("id") / 64).cast("int"))
                  .alias("dom"),
                  F.col("id").alias("payload")))
    return LakeTable.create(spark, root, df, cluster_by=["d", "dom"],
                            num_files=16, cluster_mode=mode)


def test_zorder_prunes_on_date_and_string_keys(spark, tmp_path):
    """The round-8 gap: a (date, string) cluster key contributed
    nothing to the Morton key. Now the second (string) dimension must
    prune under z-order where the lexicographic range layout (leading
    on the date) cannot, and the 2-D rectangle must skip files."""
    import datetime
    rng = _typed_grid_table(spark, str(tmp_path / "r"), "range")
    zod = _typed_grid_table(spark, str(tmp_path / "z"), "zorder")
    cond = [("dom", "between", ("dom10", "dom13"))]
    kept_r, total_r = rng.pruned_files(cond)
    kept_z, total_z = zod.pruned_files(cond)
    assert total_r == total_z == 16
    assert len(kept_z) < len(kept_r), (len(kept_z), len(kept_r))
    rect = [("d", "between", (datetime.date(2020, 1, 11),
                              datetime.date(2020, 1, 14))),
            ("dom", "between", ("dom10", "dom13"))]
    kept_z2, _ = zod.pruned_files(rect)
    assert len(kept_z2) < total_z


def test_zorder_typed_read_where_row_exact(spark, tmp_path):
    """Pruned typed-key z-order reads equal the full-scan filter."""
    import datetime

    from pyspark.sql import functions as F
    t = _typed_grid_table(spark, str(tmp_path / "z"), "zorder")
    lo, hi = datetime.date(2020, 1, 6), datetime.date(2020, 1, 10)
    conds = [("d", "between", (lo, hi)),
             ("dom", "between", ("dom20", "dom40"))]
    got = sorted((str(r["d"]), r["dom"])
                 for r in t.read_where(conds).collect())
    want = sorted((str(r["d"]), r["dom"])
                  for r in t.snapshot().filter(
                      F.col("d").between(lo, hi)
                      & F.col("dom").between("dom20", "dom40"))
                  .collect())
    assert got == want and got


def test_zorder_null_values_bucket_low(spark, tmp_path):
    """Round-8 ADVICE: NULL cluster values must z-bucket to 0, not
    the top bucket — a NULL-heavy table otherwise co-locates NULLs
    with the MAX key and poisons that file's footer range. Proof:
    with NULLs and the max key in play, the file holding the max-key
    rows is NOT the file holding the NULL rows."""
    from pyspark.sql import functions as F
    df = (spark.range(1000)
          .select(F.when(F.col("id") % 10 == 0, None)
                  .otherwise(F.col("id")).cast("bigint").alias("k"),
                  (F.col("id") % 7).alias("j"),
                  F.col("id").alias("payload")))
    t = LakeTable.create(spark, str(tmp_path / "t"), df,
                         cluster_by=["k", "j"], num_files=8,
                         cluster_mode="zorder")
    man = t._manifest(t.version())
    null_files = {e["path"] for e in man["files"]
                  if e.get("stats", {}).get("k", {}).get("nulls", 0)}
    max_files = {e["path"] for e in man["files"]
                 if e.get("stats", {}).get("k", {}).get("max") == 999}
    assert null_files and max_files
    assert not (null_files & max_files), \
        "NULL keys landed in the max-key file (top-bucket bug)"


def test_zorder_high_cardinality_string_hash_fallback(spark, tmp_path):
    """A string key with more distincts than 2^bits buckets falls
    back to xxhash64 bucketing — layout degrades (no lexicographic
    locality) but the write succeeds and reads stay exact."""
    from pyspark.sql import functions as F
    df = (spark.range(3000)
          .select(F.sha2(F.col("id").cast("string"), 256).alias("h"),
                  (F.col("id") % 64).alias("j"),
                  F.col("id").alias("payload")))
    t = LakeTable.create(spark, str(tmp_path / "t"), df,
                         cluster_by=["h", "j"], num_files=8,
                         cluster_mode="zorder")
    assert t.snapshot().count() == 3000
    kept, total = t.pruned_files([("j", "between", (0, 7))])
    assert len(kept) < total        # the integer dimension prunes


# --- ADD-COLUMN schema evolution (round 9) ---------------------------

def _mkw(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v bigint, w string")


def test_evolved_append_widens_and_nullfills(spark, table):
    table.append(_mkw(spark, [(4, 40, "x"), (5, 50, "y")]),
                 batch_id="evo", schema_evolution=True)
    head = table.snapshot()
    assert [f.name for f in head.schema.fields] == ["k", "v", "w"]
    got = sorted((r["k"], r["v"], r["w"]) for r in head.collect())
    # legacy rows null-fill the new column without a rewrite
    assert got == [(1, 10, None), (2, 20, None), (3, 30, None),
                   (4, 40, "x"), (5, 50, "y")]
    # time travel: the pre-evolution snapshot keeps the OLD schema
    assert [f.name for f in table.snapshot(version=1).schema.fields] \
        == ["k", "v"]


def test_evolved_append_replay_is_noop(spark, table):
    u = _mkw(spark, [(4, 40, "x")])
    table.append(u, batch_id="evo", schema_evolution=True)
    v = table.version()
    table.append(u, batch_id="evo", schema_evolution=True)
    assert table.version() == v


def test_evolution_rejects_dropped_and_drifted_columns(spark, table):
    dropped = spark.createDataFrame([(4, "x")], "k bigint, w string")
    with pytest.raises(ValueError, match="additive"):
        table.append(dropped, batch_id="e1", schema_evolution=True)
    drifted = spark.createDataFrame([(4, 1.5, "x")],
                                    "k bigint, v double, w string")
    with pytest.raises(ValueError, match="type mismatch"):
        table.append(drifted, batch_id="e2", schema_evolution=True)


def test_plain_append_still_rejects_new_columns(spark, table):
    with pytest.raises(ValueError, match="schema mismatch"):
        table.append(_mkw(spark, [(4, 40, "x")]), batch_id="e3")


def test_post_evolution_merge_and_compact_keep_widened_rows(spark,
                                                            table):
    table.append(_mkw(spark, [(4, 40, "x")]), batch_id="evo",
                 schema_evolution=True)
    table.merge(_mkw(spark, [(1, 11, "z"), (6, 60, "q")]), "k",
                batch_id="m1")
    table.compact(batch_id="c1", target_file_bytes=1 << 20)
    got = sorted((r["k"], r["v"], r["w"])
                 for r in table.snapshot().collect())
    assert got == [(1, 11, "z"), (2, 20, None), (3, 30, None),
                   (4, 40, "x"), (6, 60, "q")]
