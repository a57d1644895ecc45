"""Package the engine for spark-submit --py-files.

    python tools/build_pyfiles.py [out.zip]

Zips `osm_admin_boundary_conflation_spark/` (sources only) so a cluster
run is:

    spark-submit --py-files engine.zip conflate_engine.py geotag \
        --sf-dir ... --output ... --checkpoint ...

Deterministic archive: fixed timestamps, sorted member order — the same
tree always produces byte-identical zips (reproducible deploys).
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "osm_admin_boundary_conflation_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    members = []
    for dirpath, _dirs, files in os.walk(os.path.join(root, PKG)):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                members.append((os.path.relpath(full, root), full))
    members.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in members:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    print(build(out))
