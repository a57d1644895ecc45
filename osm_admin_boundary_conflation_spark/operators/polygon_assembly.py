"""G4: relation member ways → assembled multipolygon (per relation).

Mirrors /root/reference/common.py:37-69
(create_geometry_from_osm_response): outer member ways are linemerged /
polygonized into rings and unioned; inner ways apply as
symmetric_difference (holes when contained). Scored against an optional
reference WKT (IoU — measure_quality.py:100-104) and an optional probe
point (point-in-polygon).

Scale shape: ONE shuffle (groupBy rel_id), then grouped ``applyInPandas``
— a relation's member set is small (10^2..10^4 ways) while relations
are many, so the per-group Python kernel parallelizes across relations;
no driver-side loops, no per-row Python outside the Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import geometry as G

_OUT_SCHEMA = (
    "rel_id long, wkt string, area double, n_outer int, n_holes int, "
    "center_in boolean, iou double, area_diff double"
)


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    rel_id = int(pdf["rel_id"].iloc[0])
    outers: list[np.ndarray] = []
    inners: list[np.ndarray] = []
    for coords, role in zip(pdf["coords"], pdf["role"]):
        arr = np.asarray([list(p) for p in coords], dtype=np.float64)
        (outers if role == "outer" else inners).append(arr)
    mp = G.assemble_relation_polygon(outers, inners)
    area = G.multipolygon_area(mp)
    n_outer = len(mp)
    n_holes = sum(len(p) - 1 for p in mp)

    center_in = None
    if "probe_lon" in pdf.columns and pd.notna(pdf["probe_lon"].iloc[0]):
        probe = np.array([[float(pdf["probe_lon"].iloc[0]), float(pdf["probe_lat"].iloc[0])]])
        center_in = bool(G.points_in_multipolygon(probe, mp)[0])

    iou_v = None
    area_diff_v = None
    if "ref_wkt" in pdf.columns and pd.notna(pdf["ref_wkt"].iloc[0]):
        ref = G.parse_wkt(pdf["ref_wkt"].iloc[0])
        iou_v = float(G.iou(mp, ref))
        # measure_quality.py:106: intersection.area / cadastre.area
        area_diff_v = float(G.area_diff(ref, mp))

    return pd.DataFrame(
        [
            {
                "rel_id": rel_id,
                "wkt": G.to_wkt(mp) if mp else None,
                "area": float(area),
                "n_outer": n_outer,
                "n_holes": n_holes,
                "center_in": center_in,
                "iou": iou_v,
                "area_diff": area_diff_v,
            }
        ]
    )


def assemble_relations(members: DataFrame) -> DataFrame:
    """members(rel_id, way_id, role, coords[, probe_lon, probe_lat,
    ref_wkt]) → one row per relation with the assembled polygon."""
    return members.groupBy("rel_id").applyInPandas(_assemble_group, schema=_OUT_SCHEMA)
