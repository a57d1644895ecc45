"""Checkpoint/resume semantics (north rule; FIXTURES.md F5)."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from osm_admin_boundary_conflation_spark import datagen
from osm_admin_boundary_conflation_spark.operators import spatial_join as SJ
from osm_admin_boundary_conflation_spark.plans.checkpoint import StageRunner, resume_anti_join


@pytest.fixture()
def ckpt_dir(tmp_path):
    return str(tmp_path / "ckpt")


def run_pipeline(spark, sf_dir, ckpt_dir, run_id):
    r = StageRunner(spark, ckpt_dir, run_id=run_id)
    pages = r.stage("pages", lambda: datagen.build_pages(spark, sf_dir))
    b = r.stage("boundaries", lambda: datagen.build_boundaries(spark, sf_dir))
    out = r.stage("geotag", lambda: SJ.geotag_pages(pages, b))
    return r, out


def test_resume_skips_finished_stages(spark, sf_dir, ckpt_dir):
    r1, out1 = run_pipeline(spark, sf_dir, ckpt_dir, "r1")
    assert r1.recomputed == ["pages", "boundaries", "geotag"]
    rows1 = sorted(map(tuple, out1.select("url", "level9_id", "verdict").collect()))

    r2, out2 = run_pipeline(spark, sf_dir, ckpt_dir, "r2")
    assert r2.recomputed == [] and r2.resumed == ["pages", "boundaries", "geotag"]
    rows2 = sorted(map(tuple, out2.select("url", "level9_id", "verdict").collect()))
    assert rows1 == rows2


def test_kill_mid_pipeline_recomputes_incomplete_stage(spark, sf_dir, ckpt_dir):
    r1, out1 = run_pipeline(spark, sf_dir, ckpt_dir, "r1")
    rows1 = sorted(map(tuple, out1.select("url", "level9_id").collect()))
    # simulate a crash mid-write of the last stage: drop its _SUCCESS marker
    os.remove(os.path.join(ckpt_dir, "stage=geotag", "_SUCCESS"))
    r2, out2 = run_pipeline(spark, sf_dir, ckpt_dir, "r2")
    assert r2.resumed == ["pages", "boundaries"]
    assert r2.recomputed == ["geotag"]
    rows2 = sorted(map(tuple, out2.select("url", "level9_id").collect()))
    assert rows1 == rows2


def test_metrics_lineage_rows(spark, sf_dir, ckpt_dir):
    r1, out1 = run_pipeline(spark, sf_dir, ckpt_dir, "r1")
    m = r1.metrics()
    assert set(m.columns) == {"run_id", "stage", "partition_id", "rows_out", "stage_wall_ms"}
    per_stage = {r["stage"]: r["total"] for r in m.groupBy("stage").agg(F.sum("rows_out").alias("total")).collect()}
    assert per_stage["geotag"] == out1.count()
    assert per_stage["pages"] == datagen.build_pages(spark, sf_dir).count()


def test_row_level_resume_anti_join(spark, sf_dir):
    work = datagen.build_pages(spark, sf_dir).select("url")
    done = work.limit(100)
    remaining = resume_anti_join(work, done, ["url"])
    assert remaining.count() == work.count() - 100
