"""S12 HTML report artifact (conflate-report.py + index_template.html)."""

import re

from osm_admin_boundary_conflation_spark import datagen_osm
from osm_admin_boundary_conflation_spark.operators import conflation as CF
from osm_admin_boundary_conflation_spark.report import write_report


def test_report_artifact_counts_and_links(spark, sf_dir, tmp_path):
    world = datagen_osm.build_osm_world(spark, sf_dir)
    verdicts = CF.conflate(
        world["src_ways"],
        world["src_rels"],
        world["osm_ways"],
        world["osm_node_tags"],
        world["osm_rels"],
    )
    path = str(tmp_path / "report.html")
    stats = write_report(verdicts, path, max_grid_rows=500)
    html = open(path, encoding="utf-8").read()

    # stats embedded verbatim
    assert f"<strong>Total ways</strong> &mdash; {stats['total_ways']}" in html
    assert f"<strong>Ways found in OSM</strong> &mdash; {stats['ways_with_osm']}" in html
    for verdict, n in stats["count_per_error"]:
        pct = 100.0 * n / stats["total_ways"]
        assert f"<strong>{verdict}</strong> &mdash; {n} ({pct:.2f}%)" in html

    # linkified contexts by entity type (conflate-report.py:49-62)
    assert re.search(r'openstreetmap\.org/way/105\d+', html)  # multiple-candidates ways
    assert re.search(r'openstreetmap\.org/node/5\d{9,}', html)  # tagged nodes
    assert re.search(r'openstreetmap\.org/relation/300\d+', html)  # other relations
    assert re.search(r'<td>\d+\.\d{2}m</td>', html)  # endpoint distance format

    # the reference's [0:-1] grid quirk: one fewer row than collected
    n_rows = html.count("<tr><td>")
    assert n_rows == stats["grid_rows"] == 500 - 1
