"""Snapshot table layer (S16 runtime): commits, time travel, atomicity."""

import json
import os

import pytest

from osm_admin_boundary_conflation_spark.sources import snapshot_table as ST


def test_commit_time_travel_history(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    v1 = ST.write_snapshot(spark.range(5), loc, commit_ms=100)
    v2 = ST.write_snapshot(spark.range(8), loc, commit_ms=200)
    assert (v1, v2) == (1, 2)

    assert ST.read_snapshot(spark, loc, version=1).count() == 5
    assert ST.read_snapshot(spark, loc).count() == 8  # latest

    hist = ST.snapshot_history(loc)
    assert [(h["version"], h["parent"], h["n_rows"]) for h in hist] == [
        (1, None, 5),
        (2, 1, 8),
    ]
    assert [h["committed_at_ms"] for h in hist] == [100, 200]


def test_crashed_write_is_invisible(spark, tmp_path):
    """Data dir written but manifest never renamed (crash between the
    two steps) => readers still see the previous snapshot; the next
    commit claims the next version number normally."""
    loc = str(tmp_path / "tbl")
    ST.write_snapshot(spark.range(3), loc, commit_ms=1)
    # simulate a crash: v2 data lands, manifest only reaches .tmp
    spark.range(99).write.parquet(ST._data_dir(loc, 2))
    with open(ST._manifest_path(loc, 2) + ".tmp", "w") as f:
        json.dump({"version": 2}, f)

    assert ST.read_snapshot(spark, loc).count() == 3
    assert [h["version"] for h in ST.snapshot_history(loc)] == [1]

    # recovery: the next commit claims v2 normally; the orphan data
    # dir stays invisible until vacuum() reclaims it
    ST.write_snapshot(spark.range(7), loc, commit_ms=2)
    assert ST.read_snapshot(spark, loc).count() == 7


def test_missing_version_errors(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        ST.read_snapshot(spark, loc)
    ST.write_snapshot(spark.range(2), loc, commit_ms=1)
    with pytest.raises(ValueError, match="v7 not in"):
        ST.read_snapshot(spark, loc, version=7)


def test_io_seam_routes_snapshot_format(spark, tmp_path):
    from osm_admin_boundary_conflation_spark.sources.io import read_table, write_table

    loc = str(tmp_path / "tbl")
    write_table(spark.range(4), loc, fmt="snapshot")
    write_table(spark.range(6), loc, fmt="snapshot")
    assert read_table(spark, loc, fmt="snapshot").count() == 6
    assert read_table(spark, loc, fmt="snapshot", version=1).count() == 4


def test_pushdown_survives_snapshot_read(spark, tmp_path):
    """Reads resolve manifests driver-side then hand Spark a plain
    parquet path — predicate pushdown must appear in the scan."""
    loc = str(tmp_path / "tbl")
    ST.write_snapshot(spark.range(100), loc, commit_ms=1)
    df = ST.read_snapshot(spark, loc).filter("id > 90")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)]" in plan


def test_delete_vectors_merge_on_read_and_compaction(spark, tmp_path):
    """Delete commits store only keys; readers fold the chain; time
    travel to the base is unaffected; compaction folds the chain back
    into a data snapshot with identical contents."""
    loc = str(tmp_path / "tbl")
    base = spark.range(20).withColumnRenamed("id", "k")
    ST.write_snapshot(base, loc, commit_ms=1)
    ST.write_delete_snapshot(base.filter("k % 4 = 0").select("k"), loc, "k", commit_ms=2)
    ST.write_delete_snapshot(base.filter("k % 5 = 0").select("k"), loc, "k", commit_ms=3)

    expect = {k for k in range(20) if k % 4 != 0 and k % 5 != 0}
    got = {r.k for r in ST.read_snapshot(spark, loc).collect()}
    assert got == expect
    # intermediate version applies only the first delete
    got_v2 = {r.k for r in ST.read_snapshot(spark, loc, version=2).collect()}
    assert got_v2 == {k for k in range(20) if k % 4 != 0}
    # time travel to the base sees everything
    assert ST.read_snapshot(spark, loc, version=1).count() == 20
    # history carries the commit types
    assert [h["type"] for h in ST.snapshot_history(loc)] == ["data", "delete", "delete"]

    # compaction: materialize the merged view as a data snapshot
    ST.write_snapshot(ST.read_snapshot(spark, loc), loc, commit_ms=4)
    hist = ST.snapshot_history(loc)
    assert hist[-1]["type"] == "data" and hist[-1]["n_rows"] == len(expect)
    assert {r.k for r in ST.read_snapshot(spark, loc).collect()} == expect


def test_delete_from_empty_table_errors(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        ST.write_delete_snapshot(spark.range(1).withColumnRenamed("id", "k"),
                                 str(tmp_path / "none"), "k")


def test_vacuum_removes_only_orphans(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    ST.write_snapshot(spark.range(5), loc, commit_ms=1)
    ST.write_snapshot(spark.range(6), loc, commit_ms=2)
    # orphan: crashed v3 (data dir + .tmp manifest, no manifest)
    spark.range(9).write.parquet(ST._data_dir(loc, 3))
    with open(ST._manifest_path(loc, 3) + ".tmp", "w") as f:
        f.write("{}")

    removed = ST.vacuum(loc)
    assert removed == ["data/snap-000003"]
    # every committed version still readable
    assert ST.read_snapshot(spark, loc, version=1).count() == 5
    assert ST.read_snapshot(spark, loc, version=2).count() == 6
    assert not any(f.endswith(".tmp") for f in os.listdir(ST._meta_dir(loc)))
    # idempotent
    assert ST.vacuum(loc) == []


def test_append_chain_and_compaction(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    ST.write_append_snapshot(spark.range(0, 3), loc, commit_ms=1)
    ST.write_append_snapshot(spark.range(3, 7), loc, commit_ms=2)
    ST.write_append_snapshot(spark.range(7, 8), loc, commit_ms=3)
    assert {r.id for r in ST.read_snapshot(spark, loc).collect()} == set(range(8))
    # time travel mid-chain
    assert ST.read_snapshot(spark, loc, version=2).count() == 7
    hist = ST.snapshot_history(loc)
    assert [h["type"] for h in hist] == ["append"] * 3
    # appends compose with deletes, then compaction folds everything
    ST.write_delete_snapshot(
        spark.range(2).withColumnRenamed("id", "id"), loc, "id", commit_ms=4
    )
    assert {r.id for r in ST.read_snapshot(spark, loc).collect()} == set(range(2, 8))
    ST.write_snapshot(ST.read_snapshot(spark, loc), loc, commit_ms=5)
    assert ST.snapshot_history(loc)[-1]["n_rows"] == 6


def test_streaming_commit_idempotent_on_replay(spark, tmp_path):
    """foreachBatch is at-least-once: a batch replayed after a crash
    that happened post-commit/pre-checkpoint must NOT append twice
    (ADVICE r04 item 1). The batch_id watermark in the manifests makes
    the table commit exactly-once."""
    from osm_admin_boundary_conflation_spark.streaming.stream_ingest import (
        commit_batch_idempotent,
    )

    loc = str(tmp_path / "tbl")
    assert commit_batch_idempotent(spark.range(3), 0, loc) == 1
    # replay of batch 0 (crash between table commit and checkpoint)
    assert commit_batch_idempotent(spark.range(3), 0, loc) is None
    assert commit_batch_idempotent(spark.range(3, 8), 1, loc) == 2
    # replay of an OLDER batch after a newer one committed
    assert commit_batch_idempotent(spark.range(3), 0, loc) is None

    assert ST.read_snapshot(spark, loc).count() == 8
    hist = ST.snapshot_history(loc)
    assert len(hist) == 2 and ST.latest_batch_id(loc) == 1
    # empty trailing batch: skipped too
    assert commit_batch_idempotent(spark.range(0), 2, loc) is None
    assert len(ST.snapshot_history(loc)) == 2


def test_maybe_compact_folds_long_chains(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    for i in range(5):
        ST.write_append_snapshot(spark.range(i * 2, i * 2 + 2), loc, commit_ms=i)
    assert ST.chain_length(loc) == 4
    # under threshold: no-op
    assert ST.maybe_compact(spark, loc, max_links=4) is None
    # over threshold: folds to one data snapshot, contents unchanged
    v = ST.maybe_compact(spark, loc, max_links=3)
    assert v == 6 and ST.chain_length(loc) == 0
    assert {r.id for r in ST.read_snapshot(spark, loc).collect()} == set(range(10))
    # history and time travel survive the fold
    assert ST.read_snapshot(spark, loc, version=2).count() == 4
    assert [h["type"] for h in ST.snapshot_history(loc)] == ["append"] * 5 + ["data"]


def test_io_seam_snapshot_append_and_rejections(spark, tmp_path):
    """ADVICE r04 item 3: write_table must honor mode='append' for
    fmt='snapshot' and reject unsupported mode/partition_by instead of
    silently full-replacing."""
    import pytest as _pytest

    from osm_admin_boundary_conflation_spark.sources.io import read_table, write_table

    loc = str(tmp_path / "tbl")
    write_table(spark.range(4), loc, fmt="snapshot")
    write_table(spark.range(4, 9), loc, mode="append", fmt="snapshot")
    assert read_table(spark, loc, fmt="snapshot").count() == 9
    assert ST.snapshot_history(loc)[-1]["type"] == "append"
    with _pytest.raises(ValueError, match="partition_by"):
        write_table(spark.range(2), loc, mode="append", fmt="snapshot", partition_by=["id"])
    with _pytest.raises(ValueError, match="unsupported mode"):
        write_table(spark.range(2), loc, mode="error", fmt="snapshot")


def test_partitioned_snapshot_prunes_partitions(spark, tmp_path):
    """write_snapshot(partition_by=...) lays the data out hive-style;
    a filtered read THROUGH time travel must show PartitionFilters in
    the scan — pruning survives the snapshot indirection."""
    import pyspark.sql.functions as F

    loc = str(tmp_path / "tbl")
    df = spark.range(100).withColumn("bucket", F.col("id") % 5)
    ST.write_snapshot(df, loc, commit_ms=1, partition_by=["bucket"])
    assert ST.snapshot_history(loc)[-1]["n_rows"] == 100

    got = ST.read_snapshot(spark, loc).filter(F.col("bucket") == 3)
    assert got.count() == 20
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan and "= 3)" in plan


def test_commit_counts_without_second_scan(spark, tmp_path, monkeypatch):
    """VERDICT r04 item 3: the manifest row count must come from an
    Observation folded into the write job, not a re-read of the files
    just written. Monkeypatch count()/collect-style driver actions to
    raise so any second-scan path fails loudly."""
    from pyspark.sql import DataFrame

    def boom(self, *a, **k):
        raise AssertionError("commit must not run a second counting job")

    monkeypatch.setattr(DataFrame, "count", boom)

    loc = str(tmp_path / "tbl")
    v = ST.write_snapshot(spark.range(7), loc, commit_ms=1)
    ST.write_append_snapshot(spark.range(7, 10), loc, commit_ms=2)
    ST.write_delete_snapshot(spark.range(2), loc, "id", commit_ms=3)
    monkeypatch.undo()

    hist = ST.snapshot_history(loc)
    assert v == 1 and hist[0]["n_rows"] == 7
    assert {r.id for r in ST.read_snapshot(spark, loc).collect()} == set(range(2, 10))


def test_concurrent_append_commits_no_lost_update(spark, tmp_path):
    """VERDICT r04 item 4: two writers committing appends concurrently
    must BOTH land — version claim is the atomic manifest hard-link,
    losers re-resolve the parent and retry. History must show every
    commit with a correct parent chain and no gaps or lost rows."""
    import threading

    loc = str(tmp_path / "tbl")
    n_writers, per = 4, 3
    barrier = threading.Barrier(n_writers)
    errs = []

    def writer(k):
        try:
            barrier.wait()
            for j in range(per):
                lo = (k * per + j) * 10
                ST.write_append_snapshot(
                    spark.range(lo, lo + 10), loc, commit_ms=k * 100 + j
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(k,)) for k in range(n_writers)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs

    hist = ST.snapshot_history(loc)
    assert [h["version"] for h in hist] == list(range(1, n_writers * per + 1))
    # parent chain is exactly version-1: no forks, no lost updates
    assert [h["parent"] for h in hist] == [None] + list(range(1, n_writers * per))
    got = {r.id for r in ST.read_snapshot(spark, loc).collect()}
    assert got == set(
        x for base in range(n_writers * per) for x in range(base * 10, base * 10 + 10)
    )
    # every attempt's data dir is referenced (no clobbered files)
    import json as _json

    dirs = set()
    for v in range(1, n_writers * per + 1):
        with open(ST._manifest_path(loc, v)) as f:
            dirs.add(_json.load(f)["data_dir"])
    assert len(dirs) == n_writers * per


def test_compaction_preserves_batch_watermark(spark, tmp_path):
    """Folding the append chain must NOT reset streaming idempotence:
    latest_batch_id scans ALL manifests, so a replayed batch after a
    compaction is still skipped."""
    from osm_admin_boundary_conflation_spark.streaming.stream_ingest import (
        commit_batch_idempotent,
    )

    loc = str(tmp_path / "tbl")
    for b in range(4):
        assert commit_batch_idempotent(spark.range(b * 5, b * 5 + 5), b, loc)
    assert ST.maybe_compact(spark, loc, max_links=1) is not None
    # replay of an already-committed batch AFTER the fold: still skipped
    assert commit_batch_idempotent(spark.range(5), 3, loc) is None
    assert ST.latest_batch_id(loc) == 3
    assert ST.read_snapshot(spark, loc).count() == 20


def test_vacuum_preserves_staged_wap_data(spark, tmp_path):
    """ADVICE r05 #1: a staged (unpublished) WAP snapshot's data is
    live — vacuum must not reclaim it, and publish after a vacuum must
    still succeed."""
    loc = str(tmp_path / "tbl")
    ST.write_snapshot(spark.range(4), loc, commit_ms=1)
    ST.write_staged_snapshot(spark.range(9), loc, token="t1", commit_ms=2)
    # plant a true orphan so we know vacuum still reclaims those
    spark.range(99).write.parquet(os.path.join(loc, "data", "snap-orphan"))

    removed = ST.vacuum(loc)
    assert removed == [os.path.join("data", "snap-orphan")]

    assert ST.read_staged(spark, loc, "t1").count() == 9
    v = ST.publish_staged(loc, "t1", commit_ms=3)
    assert ST.read_snapshot(spark, loc, version=v).count() == 9


def test_publish_refuses_missing_data_and_rolls_back_claim(spark, tmp_path):
    """publish_staged verifies the staged data dir exists before
    committing; on failure the staged marker is restored so the stage
    can be rewritten or abandoned cleanly."""
    import shutil

    loc = str(tmp_path / "tbl")
    ST.write_snapshot(spark.range(4), loc, commit_ms=1)
    ST.write_staged_snapshot(spark.range(9), loc, token="t1", commit_ms=2)
    spath = os.path.join(loc, "metadata", "staged", "t1.json")
    with open(spath) as f:
        ddir = json.load(f)["data_dir"]
    shutil.rmtree(os.path.join(loc, ddir))  # simulate foreign reclaim

    with pytest.raises(FileNotFoundError, match="staged data dir"):
        ST.publish_staged(loc, "t1")
    assert os.path.exists(spath)  # claim rolled back
    assert [h["version"] for h in ST.snapshot_history(loc)] == [1]  # no commit


def test_publish_stamps_publish_time_monotonic(spark, tmp_path):
    """ADVICE r05 #3: a snapshot staged long ago but published now must
    not time-travel before later commits — committed_at_ms is publish
    time; stage time survives as staged_at_ms."""
    loc = str(tmp_path / "tbl")
    ST.write_snapshot(spark.range(4), loc, commit_ms=1000)
    ST.write_staged_snapshot(spark.range(9), loc, token="old", commit_ms=500)
    ST.write_snapshot(spark.range(6), loc, commit_ms=2000)
    v = ST.publish_staged(loc, "old", commit_ms=3000)

    hist = ST.snapshot_history(loc)
    stamps = [h["committed_at_ms"] for h in hist]
    assert stamps == sorted(stamps) == [1000, 2000, 3000]
    with open(ST._manifest_path(loc, v)) as f:
        m = json.load(f)
    assert m["staged_at_ms"] == 500
    # as-of 2500: the staged-at-500 snapshot was NOT visible yet
    assert ST.version_as_of(loc, 2500) == 2
    assert ST.version_as_of(loc, 3000) == v


def test_replace_commit_conditional_on_parent(spark, tmp_path):
    """ADVICE r05 #2: a full-replace derived from a stale read must
    abort, not silently drop a concurrent append; maybe_compact
    recomputes from the new parent instead."""
    loc = str(tmp_path / "tbl")
    v1 = ST.write_snapshot(spark.range(5), loc, commit_ms=1)
    # concurrent append lands after our (simulated) derive-read
    ST.write_append_snapshot(spark.range(100, 103), loc, commit_ms=2)
    with pytest.raises(ST.SnapshotConflictError, match="concurrent commit"):
        ST.write_snapshot(spark.range(5), loc, expected_parent=v1)
    # nothing committed by the failed replace
    assert [h["version"] for h in ST.snapshot_history(loc)] == [1, 2]
    assert ST.read_snapshot(spark, loc).count() == 8


def test_maybe_compact_recomputes_after_conflict(spark, tmp_path, monkeypatch):
    """A commit racing the fold makes the conditional replace fail once;
    maybe_compact retries from the new tip and the folded snapshot
    contains the racer's rows."""
    loc = str(tmp_path / "tbl")
    for b in range(4):
        ST.write_append_snapshot(spark.range(b * 5, b * 5 + 5), loc, commit_ms=b)

    real_read = ST.read_snapshot
    raced = {"done": False}

    def racing_read(spark_, location_, version=None, _depth=0):
        df = real_read(spark_, location_, version=version, _depth=_depth)
        if not raced["done"] and _depth == 0:
            raced["done"] = True
            ST.write_append_snapshot(spark_.range(900, 903), location_, commit_ms=99)
        return df

    monkeypatch.setattr(ST, "read_snapshot", racing_read)
    v = ST.maybe_compact(spark, loc, max_links=1)
    assert v is not None
    got = {r.id for r in real_read(spark, loc, version=v).collect()}
    assert got == set(range(20)) | {900, 901, 902}


def test_checked_write_null_key_is_not_a_duplicate(spark, tmp_path):
    # A single NULL-keyed row must not trip the unique-key constraint
    # (ADVICE r06: bare countDistinct silently drops NULL-keyed rows);
    # genuine duplicates among NULL keys ARE still duplicates.
    import pyspark.sql.functions as F
    from osm_admin_boundary_conflation_spark.sources import snapshot_table as ST

    loc = str(tmp_path / "tbl")
    one_null = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c")], "k int, v string"
    )
    v = ST.write_snapshot_checked(one_null, loc, unique_key=["k"], commit_ms=1)
    assert v == 1
    dup_nulls = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c")], "k int, v string"
    )
    with pytest.raises(ST.ConstraintViolation, match="1 duplicate"):
        ST.write_snapshot_checked(dup_nulls, loc, unique_key=["k"], commit_ms=2)
    # compound key: NULL in one component, distinct in the other → OK
    comp = spark.createDataFrame(
        [(None, 1, "x"), (None, 2, "y")], "a int, b int, v string"
    )
    v = ST.write_snapshot_checked(comp, loc, unique_key=["a", "b"], commit_ms=3)
    assert v == 2


def test_rollback_pointer_commit(spark, tmp_path):
    from osm_admin_boundary_conflation_spark.sources import snapshot_table as ST

    loc = str(tmp_path / "tbl")
    ST.write_snapshot(spark.range(10), loc, commit_ms=1)
    ST.write_snapshot(spark.range(3), loc, commit_ms=2)
    v = ST.rollback_snapshot(loc, 1, commit_ms=3)
    assert v == 3
    assert ST.read_snapshot(spark, loc).count() == 10          # head = restored state
    assert ST.read_snapshot(spark, loc, version=2).count() == 3  # forensics intact
    # vacuum keeps every data dir (all still referenced by v1/v2)
    assert ST.vacuum(loc) == []
    assert ST.read_snapshot(spark, loc).count() == 10
    # chain_length resolves THROUGH the pointer
    ST.write_append_snapshot(spark.range(5), loc, commit_ms=4)
    assert ST.chain_length(loc) == 1
    assert ST.read_snapshot(spark, loc).count() == 15
    with pytest.raises(ValueError, match="cannot roll back"):
        ST.rollback_snapshot(loc, 99)


def test_expire_snapshots_retention_closure(spark, tmp_path):
    from osm_admin_boundary_conflation_spark.sources import snapshot_table as ST

    loc = str(tmp_path / "tbl")
    ST.write_snapshot(spark.range(10), loc, commit_ms=1)
    ST.write_snapshot(spark.range(20), loc, commit_ms=2)
    ST.write_append_snapshot(spark.range(5), loc, commit_ms=3)
    ST.rollback_snapshot(loc, 1, commit_ms=4)
    # keep_last=1 keeps v4; closure pulls v1 (rollback restore target);
    # v2 and v3 expire even though v3 chains to v2 — neither is needed
    expired = ST.expire_snapshots(loc, keep_last=1)
    assert expired == [2, 3]
    assert ST.read_snapshot(spark, loc).count() == 10
    assert ST.read_snapshot(spark, loc, version=1).count() == 10
    with pytest.raises(ValueError):
        ST.read_snapshot(spark, loc, version=2)
    # vacuum reclaims the two expired data dirs, keeps v1's
    assert len(ST.vacuum(loc)) == 2
    assert ST.read_snapshot(spark, loc).count() == 10
    # the manifest log matches the surviving listing (repair is a no-op)
    assert ST.repair_manifest_log(loc) == 0
    assert [r["version"] for r in ST.read_manifest_log(loc)] == [1, 4]


def test_expire_snapshots_keeps_rename_parent(spark, tmp_path):
    """ADVICE r07 (high): the retention closure must follow RENAME
    pointer manifests to their parent — expire after a rename used to
    drop the parent the current version reads through, and vacuum then
    deleted its data dir (permanent loss of live table state)."""
    from osm_admin_boundary_conflation_spark.sources import snapshot_table as ST

    loc = str(tmp_path / "tbl")
    ST.write_snapshot(spark.range(10).withColumnRenamed("id", "a"), loc, commit_ms=1)
    v = ST.rename_columns(loc, {"a": "b"}, commit_ms=2)
    assert v == 2
    expired = ST.expire_snapshots(loc, keep_last=1)
    assert expired == []  # v1 is the rename's parent: must survive
    assert ST.vacuum(loc) == []  # and its data dir must not be reclaimed
    head = ST.read_snapshot(spark, loc)
    assert head.columns == ["b"] and head.count() == 10
    # a rename above an expirable chain still lets unrelated versions go
    ST.write_snapshot(spark.range(7).withColumnRenamed("id", "b"), loc, commit_ms=3)
    expired = ST.expire_snapshots(loc, keep_last=1)
    assert expired == [1, 2]
    assert ST.read_snapshot(spark, loc).count() == 7
