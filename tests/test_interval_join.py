"""Bucketed interval join: differential vs naive inequality join."""

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark.operators.interval_join import interval_join


def _run(spark, pts, ivs, width):
    p = spark.createDataFrame(pts, "pid long, x long")
    i = spark.createDataFrame(ivs, "iid long, s long, e long")
    got = {
        (r.pid, r.iid)
        for r in interval_join(p, i, width=width).select("pid", "iid").collect()
    }
    want = {
        (r.pid, r.iid)
        for r in p.join(i, (F.col("s") <= F.col("x")) & (F.col("x") < F.col("e")))
        .select("pid", "iid")
        .collect()
    }
    return got, want


def test_boundaries_halfopen(spark):
    # x == s included, x == e-1 included, x == e excluded
    got, want = _run(spark, [(1, 10), (2, 19), (3, 20)], [(7, 10, 20)], width=16)
    assert got == want == {(1, 7), (2, 7)}


def test_interval_spanning_many_buckets_no_dupes(spark):
    # one long interval over many width-4 buckets: each point matches ONCE
    got, want = _run(spark, [(i, i) for i in range(0, 40)], [(1, 3, 37)], width=4)
    assert got == want
    assert len(got) == 34  # 3..36


def test_differential_random(spark):
    # deterministic pseudo-random layout, intervals shorter and longer than width
    pts = [(i, (i * 37) % 200) for i in range(120)]
    ivs = [(j, (j * 53) % 180, (j * 53) % 180 + 1 + (j * 29) % 60) for j in range(25)]
    got, want = _run(spark, pts, ivs, width=16)
    assert got == want and len(got) > 0


def test_no_nested_loop_in_plan(spark):
    p = spark.createDataFrame([(1, 5)], "pid long, x long")
    i = spark.createDataFrame([(1, 0, 10)], "iid long, s long, e long")
    plan = interval_join(p, i, width=8)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan


def test_rect_overlap_differential(spark):
    from osm_admin_boundary_conflation_spark.operators.spatial_join import rect_overlap_join

    # boxes both smaller and larger than the cell width, incl. exact-touch
    # (touching edges do NOT overlap under half-open semantics)
    a_rows = [(i, (i * 7) % 40, (i * 11) % 40, (i * 7) % 40 + 1 + i % 13, (i * 11) % 40 + 1 + i % 9)
              for i in range(60)]
    b_rows = [(j, (j * 5) % 40, (j * 13) % 40, (j * 5) % 40 + 1 + j % 17, (j * 13) % 40 + 1 + j % 6)
              for j in range(60)]
    a = spark.createDataFrame(a_rows, "aid long, ax0 long, ay0 long, ax1 long, ay1 long")
    b = spark.createDataFrame(b_rows, "bid long, bx0 long, by0 long, bx1 long, by1 long")
    got = rect_overlap_join(a, b, width=8).select("aid", "bid").collect()
    got_set = {(r.aid, r.bid) for r in got}
    assert len(got) == len(got_set), "reference-cell trick must emit each pair once"
    import pyspark.sql.functions as F
    want = {
        (r.aid, r.bid)
        for r in a.join(
            b,
            (F.col("ax0") < F.col("bx1")) & (F.col("bx0") < F.col("ax1"))
            & (F.col("ay0") < F.col("by1")) & (F.col("by0") < F.col("ay1")),
        ).select("aid", "bid").collect()
    }
    assert got_set == want and len(want) > 50


def test_asof_tiebreak_deterministic(spark):
    """Several right rows at the SAME (key, ts): the max-tiebreak row wins."""
    import pyspark.sql.functions as F

    from osm_admin_boundary_conflation_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100, 900)], "key long, tus long, event_id long")
    right = spark.createDataFrame(
        [(1, 100, 7, 7), (1, 100, 9, 9), (1, 100, 8, 8), (1, 50, 1, 1)],
        "key long, tus long, event_id long, val long",
    )
    for _ in range(3):
        got = asof_join(
            left, right, key="key", ts="tus", val="val", tiebreak="event_id"
        ).select("val").first()
        assert got.val == 9


def test_operators_tolerate_empty_inputs(spark):
    """Core round-3 operators: empty input → empty output, no exception."""
    import pyspark.sql.functions as F

    from osm_admin_boundary_conflation_spark.operators.graph import connected_components
    from osm_admin_boundary_conflation_spark.operators.interval_join import interval_join
    from osm_admin_boundary_conflation_spark.operators.simplify import drop_collinear
    from osm_admin_boundary_conflation_spark.operators.spatial_join import rect_overlap_join

    empty_nodes = spark.createDataFrame([], "id long")
    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty_nodes, empty_edges).count() == 0

    pts = spark.createDataFrame([], "pid long, x long")
    ivs = spark.createDataFrame([(1, 0, 10)], "iid long, s long, e long")
    assert interval_join(pts, ivs).count() == 0
    assert interval_join(
        spark.createDataFrame([(1, 5)], "pid long, x long"),
        spark.createDataFrame([], "iid long, s long, e long"),
    ).count() == 0

    a = spark.createDataFrame([], "aid long, ax0 long, ay0 long, ax1 long, ay1 long")
    b = spark.createDataFrame([(1, 0, 0, 2, 2)], "bid long, bx0 long, by0 long, bx1 long, by1 long")
    assert rect_overlap_join(a, b).count() == 0

    nodes = spark.createDataFrame([], "wid long, i long, x long, y long")
    assert drop_collinear(nodes).filter(F.col("keep")).count() == 0
    # single-node way: endpoint rule keeps it
    one = spark.createDataFrame([(1, 0, 0, 0)], "wid long, i long, x long, y long")
    assert drop_collinear(one).filter(F.col("keep")).count() == 1
