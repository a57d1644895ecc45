"""Golden end-to-end regression (SURVEY §5 item 2 — mirrors the
reference's sort + diff of result CSVs, daily-measurement.sh:52-63):
recompute the flagship output, canonical-sort, byte-compare against the
committed golden file. Also proves the skew-salting path spreads the
hot cell across reducers (SURVEY §7 item 6)."""

import os

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark import datagen
from osm_admin_boundary_conflation_spark.operators import spatial_join as SJ

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "geotag_sf0001.csv")


def test_geotag_golden_byte_identical(spark, sf_dir):
    df = SJ.geotag_pages(
        datagen.build_pages(spark, sf_dir), datagen.build_boundaries(spark, sf_dir)
    )
    rows = sorted(
        (r["url"], r["level9_id"] or "", r["cell_id"], r["verdict"]) for r in df.collect()
    )
    got = "url,level9_id,cell_id,verdict\n" + "".join(",".join(r) + "\n" for r in rows)
    with open(GOLDEN) as f:
        want = f.read()
    assert got.encode() == want.encode()


def test_salting_spreads_hot_cell(spark, sf_dir):
    """The hotspot (>=30% of pages in one cell) pins one reducer without
    salting; with n_salt=8 the hot key's rows spread over ~8 partitions."""
    pages = datagen.build_pages(spark, sf_dir)
    ex = SJ.extract_pages_geo(pages, res=6).select("url", "cell_id")
    hot = (
        ex.groupBy("cell_id").count().orderBy(F.col("count").desc()).limit(1).collect()[0]
    )
    assert hot["count"] >= 0.29 * ex.count()

    n_salt = 8
    salted = ex.filter(F.col("cell_id") == hot["cell_id"]).withColumn(
        "_salt", F.pmod(F.xxhash64("url"), F.lit(n_salt))
    )
    shuffled = salted.repartition(n_salt * 2, "cell_id", "_salt")
    dist = (
        shuffled.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    n_parts_used = len(dist)
    max_share = max(r["count"] for r in dist) / hot["count"]
    # unsalted, all rows land in ONE partition; salted they spread
    assert n_parts_used >= n_salt // 2
    assert max_share < 0.5


GOLDEN_ASSEMBLY = os.path.join(os.path.dirname(__file__), "golden", "polygon_assembly_sf0001.csv")
GOLDEN_UNGLUE = os.path.join(os.path.dirname(__file__), "golden", "unglue_counts_sf0001.csv")


def _canon_csv(header, rows):
    return header + "\n" + "".join(",".join(str(x) for x in r) + "\n" for r in sorted(rows))


def test_polygon_assembly_golden(spark, sf_dir):
    """Round-2 golden: assembled-polygon stats are byte-stable between
    rounds (catches kernel drift the per-round oracle can't — the oracle
    is recomputed, the golden is committed)."""
    from osm_admin_boundary_conflation_spark.queries import q_polygon_assembly

    rows = [
        (r["rel_id"], r["area"], r["n_outer"], r["n_holes"], r["center_in"], r["iou"])
        for r in q_polygon_assembly(spark, sf_dir).collect()
    ]
    got = _canon_csv("rel_id,area,n_outer,n_holes,center_in,iou", rows)
    with open(GOLDEN_ASSEMBLY) as f:
        assert got == f.read()


def test_unglue_verdict_counts_golden(spark, sf_dir):
    from osm_admin_boundary_conflation_spark.queries import q_conflate_verdicts_unglue

    df = q_conflate_verdicts_unglue(spark, sf_dir)
    rows = [
        (r["verdict"], r["n_unglued"], r["count"])
        for r in df.groupBy("verdict", "n_unglued").count().collect()
    ]
    got = _canon_csv("verdict,n_unglued,count", rows)
    with open(GOLDEN_UNGLUE) as f:
        assert got == f.read()
