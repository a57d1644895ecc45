"""spark-submit --py-files deployment contract (north rule: the engine
runs via spark-submit on a cluster; locally we prove the packaging +
entry point work in a fresh JVM with the package ONLY on --py-files)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_geotag(tmp_path):
    from tools.build_pyfiles import build

    zip_path = build(str(tmp_path / "engine.zip"), REPO)
    # byte-identical rebuild (reproducible deploy artifact)
    zip2 = build(str(tmp_path / "engine2.zip"), REPO)
    assert open(zip_path, "rb").read() == open(zip2, "rb").read()

    spark_submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    out_dir = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH="")  # package must come from --py-files
    # stage the entry script ALONE (real deployments ship script + zip;
    # the package must resolve from --py-files, not the repo checkout)
    script = str(tmp_path / "conflate_engine.py")
    with open(os.path.join(REPO, "conflate_engine.py")) as f:
        open(script, "w").write(f.read())
    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            script,
            "geotag",
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", out_dir,
            "--checkpoint", str(tmp_path / "ckpt"),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # NOT the repo root: imports must resolve from the zip
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "job=geotag rows=" in res.stdout
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS"))
