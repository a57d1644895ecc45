"""Boundary segmentation / tiling (reference §3.3, translation.py).

The reference's preOutputTransform turns boundary polygons into
shared-border way segments:

  J8  corner detection: nodes belonging to >2 ways
      (translation.py:103-116 via get_shared_vertices usage :220-221)
  G13 way splitting at corner indexes, closed-way wraparound merge of
      the first/last piece (splitWay, translation.py:46-82)
  G15/O11 rotation/reversal-invariant canonical fingerprint
      (similar, translation.py:132-160) replacing the reference's
      O(n^2) sort-and-break dedup pass (translation.py:244-262) with an
      equi groupBy on the fingerprint — no quadratic pass at all
  A5  re-tag: min admin_level over parents, sorted parent id list
      (translation.py:295-324)

Scale: corner detection is one explode + groupBy count on node_id;
splitting is a scalar Arrow UDF per way; dedup is a groupBy on the
fingerprint — three shuffles, all on well-distributed keys.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StringType

from ..functions.geometry import canonical_node_fingerprint


@pandas_udf(ArrayType(ArrayType(LongType())))
def split_way_udf(node_ids: pd.Series, corner_pos: pd.Series) -> pd.Series:
    """G13: split a way's node list at corner positions. Closed ways
    wrap around: the piece after the last corner merges with the piece
    before the first (translation.py:72-79)."""

    def one(nodes, corners) -> list[list[int]]:
        nodes = list(nodes)
        if not nodes:
            return []
        closed = len(nodes) > 1 and nodes[0] == nodes[-1]
        core = nodes[:-1] if closed else nodes
        corner_list = [] if corners is None else list(corners)
        idxs = sorted(int(i) for i in corner_list if i < len(core))
        if not idxs:
            return [nodes]
        if closed:
            segs = []
            k = len(idxs)
            for j in range(k):
                a, b = idxs[j], idxs[(j + 1) % k]
                if j < k - 1:
                    segs.append(core[a : b + 1])
                else:  # wraparound merge
                    segs.append(core[a:] + core[: b + 1])
            return segs
        segs = []
        prev = 0
        for i in idxs:
            if i > prev:
                segs.append(core[prev : i + 1])
            prev = i
        if prev < len(core) - 1:
            segs.append(core[prev:])
        return segs

    return pd.Series([one(n, c) for n, c in zip(node_ids, corner_pos)])


@pandas_udf(StringType())
def fingerprint_udf(node_ids: pd.Series) -> pd.Series:
    return node_ids.map(lambda ids: canonical_node_fingerprint(list(ids)))


def detect_corners(ways: DataFrame, min_ways: int = 3) -> DataFrame:
    """J8: nodes present in >= min_ways distinct ways → corner nodes."""
    wn = ways.select("way_id", F.explode("node_ids").alias("node_id")).dropDuplicates(
        ["way_id", "node_id"]
    )
    return (
        wn.groupBy("node_id")
        .agg(F.count("*").alias("n_ways"))
        .filter(F.col("n_ways") >= min_ways)
        .select("node_id")
    )


def lint_metrics():
    """Runtime lint invariants (translation.py:331-370) as observed
    metrics: consecutive duplicate nodes in ways, one-node ways. Rides
    the existing scan via df.observe — no extra job (the in-pipeline
    analogue of the reference's after-each-phase lint pass)."""
    dup_nodes = F.expr(
        "size(filter(zip_with(node_ids, slice(node_ids, 2, size(node_ids) - 1),"
        " (a, b) -> a = b), x -> x))"
    )
    return [
        F.count(F.lit(1)).alias("n_ways"),
        F.sum(dup_nodes.cast("long")).alias("dup_nodes"),
        F.sum((F.size("node_ids") == 1).cast("long")).alias("one_node_ways"),
    ]


def segment_ways(ways: DataFrame, lint_observation=None) -> DataFrame:
    """ways(way_id, node_ids, admin_level) → deduped segment table
    (fp, parents, n_parents, admin_level, node_ids).

    Pass a pyspark Observation as ``lint_observation`` to collect the
    translation.py lint counters alongside the run."""
    if lint_observation is not None:
        ways = ways.observe(lint_observation, *lint_metrics())
    corners = detect_corners(ways)

    # corner positions per way (positions within the open core)
    pos = ways.select("way_id", F.posexplode("node_ids").alias("pos", "node_id"))
    corner_pos = (
        pos.join(corners, "node_id")  # corner set can be large at scale: shuffle equi join, AQE may still broadcast
        .groupBy("way_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("corner_pos"))
    )
    w = ways.join(corner_pos, "way_id", "left").withColumn(
        "corner_pos", F.coalesce("corner_pos", F.array().cast("array<int>"))
    )
    segs = w.select(
        "way_id",
        "admin_level",
        F.explode(split_way_udf(F.col("node_ids"), F.col("corner_pos"))).alias("seg_nodes"),
    )
    segs = segs.withColumn("fp", fingerprint_udf(F.col("seg_nodes")))
    # min_by on a canonical serialization, NOT first(): segments sharing
    # a fingerprint differ by rotation/reversal, and first() would make
    # node_ids vary run-to-run with partitioning — violating the
    # byte-identical-output rule (VERDICT r01 #3)
    seg_key = F.array_join(F.transform("seg_nodes", lambda x: x.cast("string")), ",")
    return segs.withColumn("seg_key", seg_key).groupBy("fp").agg(
        F.array_join(F.array_sort(F.collect_set("way_id")), ",").alias("parents"),
        F.count("*").alias("n_parents"),
        F.min(F.col("admin_level").cast("int")).alias("admin_level"),
        F.min_by("seg_nodes", "seg_key").alias("node_ids"),
    )
