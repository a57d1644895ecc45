"""Multi-table transaction protocol: atomicity, crash recovery,
idempotence."""

import os
import tempfile

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark.sources import snapshot_table as ST


def _mk(spark, tmp, name, n):
    loc = os.path.join(tmp, name)
    os.makedirs(os.path.join(loc, "metadata"), exist_ok=True)
    df = spark.range(n).select(F.col("id").alias("k"))
    ST.write_staged_snapshot(df, loc, token=f"{name}-tok", commit_ms=0)
    return loc


def test_txn_happy_path(spark):
    tmp = tempfile.mkdtemp(prefix="txn_t1_")
    a, b = _mk(spark, tmp, "a", 10), _mk(spark, tmp, "b", 20)
    txd = os.path.join(tmp, "txns")
    vs = ST.txn_commit([(a, "a-tok"), (b, "b-tok")], txd, "t1", commit_ms=1)
    assert vs == [1, 1]
    assert os.path.exists(os.path.join(txd, "t1.done"))
    assert ST.read_snapshot(spark, a).count() == 10
    assert ST.read_snapshot(spark, b).count() == 20
    # nothing torn -> recovery is a no-op on done markers
    assert ST.txn_recover(txd) == {}


def test_txn_crash_and_recover(spark):
    tmp = tempfile.mkdtemp(prefix="txn_t2_")
    a, b = _mk(spark, tmp, "a", 5), _mk(spark, tmp, "b", 7)
    txd = os.path.join(tmp, "txns")
    vs = ST.txn_commit(
        [(a, "a-tok"), (b, "b-tok")], txd, "t2", commit_ms=1, crash_after=1
    )
    assert vs == [1]
    # torn: a visible, b not; intent still present
    assert ST._versions(a) == [1] and ST._versions(b) == []
    assert os.path.exists(os.path.join(txd, "t2.intent"))
    rec = ST.txn_recover(txd, commit_ms=2)
    assert rec == {"t2": 1}
    assert ST._versions(b) == [1]
    assert os.path.exists(os.path.join(txd, "t2.done"))
    # idempotent: a second recovery finds nothing torn
    assert ST.txn_recover(txd) == {}
    # and the already-published table was NOT double-published
    assert ST._versions(a) == [1]


def test_txn_crash_before_any_publish(spark):
    tmp = tempfile.mkdtemp(prefix="txn_t3_")
    a, b = _mk(spark, tmp, "a", 3), _mk(spark, tmp, "b", 4)
    txd = os.path.join(tmp, "txns")
    vs = ST.txn_commit(
        [(a, "a-tok"), (b, "b-tok")], txd, "t3", commit_ms=1, crash_after=0
    )
    assert vs == []
    assert ST._versions(a) == [] and ST._versions(b) == []
    rec = ST.txn_recover(txd, commit_ms=2)
    assert rec == {"t3": 2}
    assert ST._versions(a) == [1] and ST._versions(b) == [1]
