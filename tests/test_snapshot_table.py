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

    # recovery: the next commit overwrites the orphaned data dir
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
