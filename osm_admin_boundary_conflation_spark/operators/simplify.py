"""Collinear-vertex polyline simplification.

OSM boundary ways carry redundant interior vertices along straight runs
(gridded imports, subdivided rectangle edges). Dropping a vertex whose
neighbours are exactly collinear with it changes nothing geometrically
and shrinks every downstream shuffle. Unlike Douglas-Peucker (a
sequential stack algorithm), the exact-collinearity test is LOCAL — one
lag/lead window per way — so it parallelizes perfectly: partition by
way, order by node sequence, one shuffle total.

Reference analogue: the reference ships full node lists to the API
unsimplified (conflate.py builds ways node-for-node); this is the scale
hygiene step it never needed at single-country size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def drop_collinear(
    nodes: DataFrame,
    wid: str = "wid",
    seq: str = "i",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Flag every node of every way; keep endpoints and corners.

    Input: one row per (way, node) with integer (or exact) coordinates.
    Output: input columns + boolean `keep` — true unless the node lies
    exactly on the segment between its neighbours (integer cross
    product == 0). Collapse with filter("keep") downstream.
    """
    w = Window.partitionBy(wid).orderBy(seq)
    px, py = F.lag(x).over(w), F.lag(y).over(w)
    nx, ny = F.lead(x).over(w), F.lead(y).over(w)
    cross = (F.col(x) - px) * (ny - F.col(y)) - (F.col(y) - py) * (nx - F.col(x))
    keep = px.isNull() | nx.isNull() | (cross != 0)
    return nodes.withColumn("keep", keep)
