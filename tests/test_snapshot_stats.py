"""File-level stats + data skipping (snapshot table, round 6).

Two obligations, tested separately:
- SOUNDNESS: a pruned read equals the unpruned filtered read for any
  predicate, including when stats are missing (all-null columns) or
  when every file is skipped.
- EFFECTIVENESS: on a range-clustered layout the manifest actually
  skips files (that's the whole point); on a z-ordered layout a
  two-column rectangle skips in both dimensions.
"""

import pyspark.sql.functions as F
import pytest

from osm_admin_boundary_conflation_spark.sources import snapshot_table as ST


def _mk(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("tag"),
    )


def test_stats_match_true_minmax_per_file(spark, tmp_path):
    loc = str(tmp_path / "t")
    ST.write_snapshot_stats(_mk(spark), loc, stats_cols=["k", "v"], cluster_by="k", n_files=4)
    import json
    import os

    with open(os.path.join(loc, "metadata", "v000001.json")) as f:
        m = json.load(f)
    assert len(m["files"]) == 4
    for frec in m["files"]:
        df = spark.read.parquet(os.path.join(loc, frec["path"]))
        true = df.agg(
            F.min("k"), F.max("k"), F.min("v"), F.max("v"), F.count(F.lit(1))
        ).collect()[0]
        assert frec["stats"]["k"] == [true[0], true[1]]
        assert frec["stats"]["v"] == [true[2], true[3]]
        assert frec["n_rows"] == true[4]


def test_pruned_equals_unpruned(spark, tmp_path):
    loc = str(tmp_path / "t")
    ST.write_snapshot_stats(_mk(spark), loc, stats_cols=["k"], cluster_by="k", n_files=8)
    full = ST.read_snapshot(spark, loc)
    for lo, hi in [(100, 299), (0, 0), (1999, 2500), (None, 50), (1900, None)]:
        pruned = ST.read_snapshot_pruned(spark, loc, [("k", lo, hi)])
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("k") >= lo)
        if hi is not None:
            cond = cond & (F.col("k") <= hi)
        expect = sorted(r.k for r in full.filter(cond).collect())
        got = sorted(r.k for r in pruned.collect())
        assert got == expect, (lo, hi)


def test_range_clustering_skips_files(spark, tmp_path):
    loc = str(tmp_path / "t")
    ST.write_snapshot_stats(_mk(spark), loc, stats_cols=["k"], cluster_by="k", n_files=16)
    kept, total = ST.files_matching(loc, [("k", 100, 299)])
    assert total == 16
    # a 10%-of-keyspace range on a range-clustered layout must hit
    # only the neighboring file(s): allow boundary overlap, not a scan
    assert len(kept) <= 3, kept
    # disjoint range skips everything, and the read is still correct
    kept0, _ = ST.files_matching(loc, [("k", 10_000, 20_000)])
    assert kept0 == []
    assert ST.read_snapshot_pruned(spark, loc, [("k", 10_000, 20_000)]).count() == 0


def test_zorder_two_dimensional_skipping(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = _mk(spark, 4096).select("k", (F.col("k") * 2654435761 % 4096).alias("u"))
    ST.write_snapshot_stats(
        df, loc, stats_cols=["k", "u"], cluster_by=("k", "u"), n_files=16
    )
    # rectangle covering ~1/16 of each dimension => ~1/256 of the area;
    # a z-layout must open well under half the files
    kept, total = ST.files_matching(loc, [("k", 0, 255), ("u", 0, 255)])
    assert total == 16
    assert len(kept) < total / 2, kept
    # and each single-dimension predicate ALSO skips (z keeps both tight)
    kept_k, _ = ST.files_matching(loc, [("k", 0, 255)])
    kept_u, _ = ST.files_matching(loc, [("u", 0, 255)])
    assert len(kept_k) < total and len(kept_u) < total
    got = ST.read_snapshot_pruned(spark, loc, [("k", 0, 255), ("u", 0, 255)]).count()
    expect = df.filter((F.col("k") <= 255) & (F.col("u") <= 255)).count()
    assert got == expect


def test_allnull_column_never_skipped(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit(None).cast("long").alias("dead")
    )
    ST.write_snapshot_stats(df, loc, stats_cols=["k", "dead"], cluster_by="k", n_files=4)
    # 'dead' has no footer min/max anywhere: a predicate on it must
    # keep every file (unknown = may match), and the re-applied filter
    # then correctly returns zero rows
    kept, total = ST.files_matching(loc, [("dead", 5, 10)])
    assert len(kept) == total == 4
    assert ST.read_snapshot_pruned(spark, loc, [("dead", 5, 10)]).count() == 0


def test_string_stats_prune(spark, tmp_path):
    loc = str(tmp_path / "t")
    df = _mk(spark).select("k", "tag")
    ST.write_snapshot_stats(df, loc, stats_cols=["tag"], cluster_by="tag", n_files=7)
    kept, total = ST.files_matching(loc, [("tag", "s3", "s3")])
    assert len(kept) < total
    got = ST.read_snapshot_pruned(spark, loc, [("tag", "s3", "s3")]).count()
    assert got == df.filter(F.col("tag") == "s3").count()


def test_pruning_rejects_chain_commits(spark, tmp_path):
    loc = str(tmp_path / "t")
    ST.write_snapshot_stats(_mk(spark), loc, stats_cols=["k"])
    ST.write_append_snapshot(spark.range(5).select(F.col("id").alias("k")), loc)
    with pytest.raises(ValueError, match="append"):
        ST.files_matching(loc, [("k", 0, 10)])
    # compaction folds the chain; the folded snapshot has no stats and
    # says so explicitly rather than silently scanning
    ST.write_snapshot(ST.read_snapshot(spark, loc), loc)
    with pytest.raises(ValueError, match="no file stats"):
        ST.files_matching(loc, [("k", 0, 10)])
