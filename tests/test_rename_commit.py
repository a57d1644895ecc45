"""Rename commits vs the rest of the snapshot machinery: chain walks,
compaction, history, time travel."""

import os
import tempfile

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark.sources import snapshot_table as ST


def test_rename_chain_compacts_and_reads(spark):
    tmp = tempfile.mkdtemp(prefix="ren_")
    loc = os.path.join(tmp, "tbl")
    df = spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 2).alias("val"))
    v1 = ST.write_append_snapshot(df, loc, commit_ms=0)
    ST.rename_columns(loc, {"val": "amount"}, commit_ms=1)
    ST.write_append_snapshot(
        spark.range(20, 30).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("amount")
        ),
        loc,
        commit_ms=2,
    )
    latest = ST.read_snapshot(spark, loc)
    assert set(latest.columns) == {"k", "amount"}
    assert latest.count() == 30
    # chain_length walks THROUGH the rename pointer (a rename must not
    # hide the appends below it from compaction accounting): base
    # append + rename + append = 1 link, same as base + append
    assert ST.chain_length(loc) == 1
    # compaction folds the rename away
    vc = ST.write_snapshot(latest, loc, commit_ms=3)
    folded = ST.read_snapshot(spark, loc, version=vc)
    assert set(folded.columns) == {"k", "amount"}
    assert folded.count() == 30
    assert ST.chain_length(loc, version=vc) == 0
    # time travel to the pre-rename version shows the old schema
    old = ST.read_snapshot(spark, loc, version=v1)
    assert set(old.columns) == {"k", "val"}
    # history lists the rename commit with its type
    types = [r["type"] for r in ST.snapshot_history(loc)]
    assert "rename" in types


def test_rename_then_delete_resolves(spark):
    tmp = tempfile.mkdtemp(prefix="ren2_")
    loc = os.path.join(tmp, "tbl")
    df = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 3).alias("val"))
    ST.write_append_snapshot(df, loc, commit_ms=0)
    ST.rename_columns(loc, {"val": "amount"}, commit_ms=1)
    ST.write_delete_snapshot(
        spark.range(3).select(F.col("id").alias("k")), loc, key_col="k", commit_ms=2
    )
    out = ST.read_snapshot(spark, loc)
    assert set(out.columns) == {"k", "amount"}
    assert out.count() == 7
    assert sorted(r["k"] for r in out.collect()) == list(range(3, 10))
