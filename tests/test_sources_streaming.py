"""OSM XML source parity (conflate.py:22-62) + Structured Streaming
geo-tag vs batch equivalence."""

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark import datagen
from osm_admin_boundary_conflation_spark.operators import spatial_join as SJ
from osm_admin_boundary_conflation_spark.sources.osm_xml import load_osm
from osm_admin_boundary_conflation_spark.streaming.stream_geotag import stream_geotag

SAMPLE_OSM = """<?xml version='1.0' encoding='UTF-8'?>
<osm version='0.6'>
  <node id='1' lat='44.8' lon='20.4'/>
  <node id='2' lat='44.81' lon='20.41'>
    <tag k='created_by' v='test'/>
  </node>
  <node id='3' lat='44.82' lon='20.42'/>
  <way id='10'>
    <nd ref='1'/>
    <nd ref='2'/>
    <nd ref='3'/>
    <tag k='boundary' v='administrative'/>
    <tag k='admin_level' v='9'/>
  </way>
  <relation id='100'>
    <member type='way' ref='10' role='outer'/>
    <tag k='type' v='boundary'/>
    <tag k='name' v='Test'/>
  </relation>
</osm>
"""


def test_osm_xml_source(spark, tmp_path):
    p = tmp_path / "sample.osm"
    p.write_text(SAMPLE_OSM)
    dfs = load_osm(spark, str(p))
    nodes = {r["id"]: r for r in dfs["nodes"].collect()}
    assert set(nodes) == {1, 2, 3}
    assert nodes[1]["lat"] == 44.8 and nodes[1]["lon"] == 20.4
    assert nodes[2]["tags"] == {"created_by": "test"}
    ways = dfs["ways"].collect()
    assert len(ways) == 1
    assert list(ways[0]["node_ids"]) == [1, 2, 3]
    assert ways[0]["tags"]["admin_level"] == "9"
    rels = dfs["relations"].collect()
    assert len(rels) == 1
    assert rels[0]["members"][0]["ref"] == 10 and rels[0]["members"][0]["role"] == "outer"
    assert rels[0]["tags"]["type"] == "boundary"


def test_stream_geotag_matches_batch(spark, sf_dir, tmp_path):
    pages = datagen.build_pages(spark, sf_dir)
    boundaries = datagen.build_boundaries(spark, sf_dir)
    in_dir, out_dir, ck_dir = (str(tmp_path / d) for d in ("in", "out", "ck"))
    # two "arriving" micro-batch files
    pages.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(in_dir)
    pages.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(in_dir)

    stream_geotag(spark, in_dir, boundaries, out_dir, ck_dir)
    got = {
        (r["url"], r["level9_id"], r["verdict"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["url"], r["level9_id"], r["verdict"])
        for r in SJ.geotag_pages(pages, boundaries).collect()
    }
    assert got == want
