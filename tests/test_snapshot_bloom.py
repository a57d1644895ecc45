"""Per-file Bloom skipping: the prune must actually skip files."""

import tempfile

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark.sources import snapshot_table as ST

SF = "/root/testdata/sf0.001"


def _build(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    loc = tempfile.mkdtemp(prefix="bloomtest_")
    ST.write_snapshot_stats(
        orders, loc, stats_cols=["o_custkey"], cluster_by="o_custkey",
        n_files=8, bloom_cols=["o_orderkey"], bloom_m=65536,
    )
    return loc, orders


def test_present_key_opens_few_files_absent_key_none(spark):
    loc, orders = _build(spark)
    some_key = orders.select(F.min("o_orderkey")).first()[0]
    kept, total = ST.files_matching_point(loc, [("o_orderkey", some_key)])
    assert total == 8
    # the key lives in exactly one file; FP rate at m=65536 is ~1e-4
    assert 1 <= len(kept) <= 2
    kept_absent, _ = ST.files_matching_point(loc, [("o_orderkey", 999999999)])
    assert kept_absent == []


def test_point_read_matches_plain_filter(spark):
    loc, orders = _build(spark)
    keys = [r.o_orderkey for r in orders.limit(3).collect()] + [424242424]
    for k in keys:
        got = ST.read_snapshot_point(spark, loc, [("o_orderkey", k)]).collect()
        want = orders.filter(F.col("o_orderkey") == k).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stats_and_bloom_combine(spark):
    loc, _ = _build(spark)
    # custkey stats exclude out-of-range even when bloom column absent
    kept, total = ST.files_matching_point(loc, [("o_custkey", 10 ** 9)])
    assert kept == []
