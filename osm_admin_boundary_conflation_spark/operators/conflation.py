"""Conflation verdict battery (reference §3.2, conflate.py dry-run).

Recomputes the reference's per-way ProcessingState verdict
(/root/reference/processing_state.py:4-27) declaratively:

  stage A  J1 membership   src_rels groupBy way → n_rels + ref keys
           (conflate.py:489-495; >=3 relations → ERROR_OVERLAPPING_WAYS
            conflate.py:557-560)
  stage B  candidate index from OSM relation TAGS (admin_level=9 + ref,
           mirroring the Overpass filters conflate.py:68-71):
           shared lookup = member of rel(r1) AND rel(r2) (S6,
           conflate.py:65-80); exclusive lookup = member of rel(r1) and
           no other level-9 relation (S7, conflate.py:83-97);
           0/1/>1 cardinality verdicts (conflate.py:516-556)
  stage C  tag/node/relation predicate flags via equi joins
           (P4 conflate.py:200-202, P5 :205-211, S8+P4/P6 :214-260,
            P7 :262-265)
  stage D  one vectorized geometry UDF per matched pair
           (P8 :365-368, P9 :370-376, G12 :297-316, G7 :278-294,
            P11 :386-391 — including the reference's lat/lon-SWAPPED
            bearing call at conflate.py:389-390, reproduced for parity)
  stage E  verdict when()-chain in exact reference evaluation order;
           dry_run=True & auto_proceed=True semantics: the rewrite path
           returns CHECKED_POSSIBLE (conflate.py:451-452) and
           non-heuristic matches skip the human gate (conflate.py:392).

Deviation (documented): ERROR_END_POINTS_FAR_APART's error_context is
floor(meters) as a string instead of str(float) — cross-engine float
formatting is not stable; the full-precision distance is still emitted
as endpoint_dist_m.

Scale: every join is an equi join on way/node/ref keys; the node→way
reverse index is a linear explode; geometry runs in one Arrow batch
stage. No driver-side loops, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, DoubleType, StructField, StructType

from ..functions import geometry as G

ALLOWED_TAGS = ("admin_level", "boundary", "note", "source", "fixme", "type", "int_name")

_GEOM_SCHEMA = StructType(
    [
        StructField("too_many", BooleanType()),
        StructField("invalid", BooleanType()),
        StructField("closed", BooleanType()),
        StructField("same", BooleanType()),
        StructField("endpoint_dist_m", DoubleType()),
        StructField("heuristic_same", BooleanType()),
        StructField("hausdorff_m", DoubleType()),
    ]
)


def _quirk_bearing(a: np.ndarray, b: np.ndarray) -> float:
    """conflate.py:389-390 passes (lon,lat) coords into a (lat,lon)
    bearing function; reproduce the swap exactly."""
    return float(G.compass_bearing(a[1], a[0], b[1], b[0]))


def _line_invalid(c: np.ndarray) -> bool:
    """shapely-LineString-invalid analogue: <2 points or zero length."""
    return len(c) < 2 or bool(np.all(np.abs(c - c[0]).max(axis=1) < 1e-15))


@pandas_udf(_GEOM_SCHEMA)
def geom_battery_udf(src: pd.Series, osm: pd.Series) -> pd.DataFrame:
    n = len(src)
    out = {
        "too_many": np.zeros(n, bool),
        "invalid": np.zeros(n, bool),
        "closed": np.zeros(n, bool),
        "same": np.zeros(n, bool),
        "endpoint_dist_m": np.full(n, np.inf),
        "heuristic_same": np.zeros(n, bool),
        "hausdorff_m": np.full(n, -1.0),
    }
    # evaluation mirrors conflate_way's short-circuit order so the O(n^2)
    # similarity math only runs for small, non-identical pairs
    for i, (s, o) in enumerate(zip(src, osm)):
        if s is None or o is None:
            out["invalid"][i] = True
            continue
        sc = np.asarray([list(p) for p in s], dtype=np.float64)
        oc = np.asarray([list(p) for p in o], dtype=np.float64)
        if len(sc) >= 2000:  # conflate.py:365-368
            out["too_many"][i] = True
            continue
        if _line_invalid(sc) or _line_invalid(oc):
            out["invalid"][i] = True
            continue
        _, s_closed, s_ring = G.validity_flags(sc)
        _, o_closed, o_ring = G.validity_flags(oc)
        if s_closed or s_ring or o_closed or o_ring:
            out["closed"][i] = True
            continue
        if G.is_same_geometry(sc, oc):
            out["same"][i] = True
            out["hausdorff_m"][i] = G.hausdorff_m(sc, oc)
            continue
        out["hausdorff_m"][i] = G.hausdorff_m(sc, oc)
        dist, should_reverse = G.endpoint_match(sc, oc)
        out["endpoint_dist_m"][i] = dist
        s_aligned = sc[::-1] if should_reverse else sc
        within = G.buffer_contains(oc, s_aligned, 0.005)
        a1 = _quirk_bearing(oc[0], oc[-1])
        a2 = _quirk_bearing(s_aligned[0], s_aligned[-1])
        out["heuristic_same"][i] = bool(within and abs(a1 - a2) < 5.0)
    return pd.DataFrame(out)


def conflate(
    src_ways: DataFrame,
    src_rels: DataFrame,
    osm_ways: DataFrame,
    osm_node_tags: DataFrame,
    osm_rels: DataFrame,
    max_endpoint_m: float = 500.0,
) -> DataFrame:
    """→ (way_id, n_rels, verdict, osm_way_id, error_context,
        endpoint_dist_m, hausdorff_m)."""
    # ---- stage A: J1 membership ------------------------------------------
    grp = src_rels.groupBy("way_id").agg(
        F.count("*").alias("n_rels"),
        F.array_sort(F.collect_list(F.col("level9_id").cast("long"))).alias("ref_keys"),
    )
    ways = src_ways.join(grp, "way_id", "left").withColumn(
        "n_rels", F.coalesce("n_rels", F.lit(0))
    )

    # ---- stage B: candidate index from OSM relation tags ------------------
    lvl9 = osm_rels.filter(
        (F.col("tags")["admin_level"] == "9") & F.col("tags")["ref"].isNotNull()
    ).select(F.col("tags")["ref"].cast("long").alias("ref"), "member_way_id")
    way_refs = lvl9.groupBy("member_way_id").agg(
        F.collect_set("ref").alias("refs"), F.count("*").alias("n_refs")
    )

    one_rel = ways.filter(F.col("n_rels") == 1).select(
        "way_id", F.col("ref_keys")[0].alias("r1")
    )
    exclusive = way_refs.filter(F.col("n_refs") == 1).select(
        F.col("refs")[0].alias("ref"), "member_way_id"
    )
    cand_single = one_rel.join(
        exclusive, one_rel.r1 == exclusive.ref, "inner"
    ).select("way_id", F.col("member_way_id").alias("osm_way_id"))

    two_rel = ways.filter(F.col("n_rels") == 2).select(
        "way_id", F.col("ref_keys")[0].alias("r1"), F.col("ref_keys")[1].alias("r2")
    )
    l1 = lvl9.alias("m1")
    l2 = lvl9.alias("m2")
    cand_shared = (
        two_rel.join(l1, F.col("m1.ref") == two_rel.r1)
        .join(
            l2,
            (F.col("m2.ref") == two_rel.r2)
            & (F.col("m2.member_way_id") == F.col("m1.member_way_id")),
        )
        .select("way_id", F.col("m1.member_way_id").alias("osm_way_id"))
    )
    cands = cand_single.unionByName(cand_shared)
    cand_agg = cands.groupBy("way_id").agg(
        F.count("*").alias("n_cands"),
        F.array_sort(F.collect_list("osm_way_id")).alias("cand_ids"),
    )
    ways = ways.join(cand_agg, "way_id", "left").withColumn(
        "n_cands", F.coalesce("n_cands", F.lit(0))
    )
    matched = ways.filter((F.col("n_cands") == 1) & (F.col("n_rels").isin(1, 2))).withColumn(
        "osm_way_id", F.col("cand_ids")[0]
    )

    # ---- stage C: predicate flags per candidate ---------------------------
    ow = osm_ways.select(
        "osm_way_id",
        F.col("coords").alias("osm_coords"),
        F.col("node_ids").alias("osm_node_ids"),
        F.col("tags").alias("osm_tags"),
    )
    matched = matched.join(ow, "osm_way_id", "left")

    tags = F.col("osm_tags")
    national_tag = tags["admin_level"].isNotNull() & (tags["admin_level"].cast("int") <= 2)
    unexpected = F.array_sort(
        F.filter(
            F.map_keys(tags),
            lambda k: (~k.isin(*[F.lit(t) for t in ALLOWED_TAGS])) & (~k.startswith("name")),
        )
    )
    matched = matched.withColumn("national_tag", F.coalesce(national_tag, F.lit(False)))
    matched = matched.withColumn(
        "unexpected_tag", F.when(F.size(unexpected) > 0, unexpected[0])
    )

    # node→way reverse index (S8): other ways sharing any node
    node_way = osm_ways.select(
        F.col("osm_way_id").alias("nw_way"), F.explode("node_ids").alias("node_id"), F.col("tags").alias("nw_tags")
    )
    cand_nodes = matched.select("way_id", "osm_way_id", F.explode("osm_node_ids").alias("node_id"))
    sharing = (
        cand_nodes.join(node_way, "node_id")
        .filter(F.col("nw_way") != F.col("osm_way_id"))
        .select("way_id", "nw_way", "nw_tags")
        .dropDuplicates(["way_id", "nw_way"])
    )
    share_nat = F.col("nw_tags")["admin_level"].isNotNull() & (
        F.col("nw_tags")["admin_level"].cast("int") <= 2
    )
    share_other = F.col("nw_tags")["boundary"].isNull() | (
        F.col("nw_tags")["boundary"] != "administrative"
    )
    share_flags = sharing.groupBy("way_id").agg(
        F.min(F.when(share_nat, F.col("nw_way"))).alias("share_national_way"),
        F.min(F.when(~share_nat & share_other, F.col("nw_way"))).alias("share_other_way"),
    )
    matched = matched.join(share_flags, "way_id", "left")

    # relation scan: relations containing the candidate or a sharing way
    scan_ways = matched.select("way_id", F.col("osm_way_id").alias("scan_way")).unionByName(
        sharing.select("way_id", F.col("nw_way").alias("scan_way"))
    )
    rels_of = scan_ways.join(
        osm_rels.withColumnRenamed("member_way_id", "scan_way"), "scan_way"
    )
    rt = F.col("tags")
    is_city = F.coalesce(rt["place"] == "city", F.lit(False))
    rel_other = (
        (rt["admin_level"].isNull() & ~is_city)
        | rt["type"].isNull()
        | ((rt["type"] != "boundary") & ~is_city)
        | (rt["boundary"].isNull() & ~is_city)
        | (rt["boundary"].isNotNull() & ~rt["boundary"].isin("administrative", "census"))
    )
    rel_national = rt["admin_level"].isNotNull() & (rt["admin_level"].cast("int") <= 2)
    rel_flags = rels_of.groupBy("way_id").agg(
        F.min(F.when(rel_other & ~rel_national, F.col("rel_id"))).alias("rel_other_id"),
        F.min(F.when(rel_national, F.col("rel_id"))).alias("rel_national_id"),
    )
    matched = matched.join(rel_flags, "way_id", "left")

    # P7: candidate nodes carrying tags (except lone created_by)
    tagged_nodes = cand_nodes.join(osm_node_tags, "node_id").filter(
        ~((F.size("tags") == 1) & F.col("tags")["created_by"].isNotNull())
    )
    node_tag_flags = tagged_nodes.groupBy("way_id").agg(
        F.array_join(F.array_sort(F.collect_set("node_id")), ",").alias("tagged_node_ids")
    )
    matched = matched.join(node_tag_flags, "way_id", "left")

    # ---- stage D: geometry battery ----------------------------------------
    matched = matched.withColumn("g", geom_battery_udf(F.col("coords"), F.col("osm_coords")))

    # ---- stage E: verdict chain (reference evaluation order) ---------------
    g = F.col("g")
    verdict = (
        F.when(g["too_many"], "ERROR_TOO_MANY_NODES")
        .when(g["invalid"], "ERROR_INVALID_SHAPE")
        .when(g["closed"], "ERROR_CLOSED_SHAPE")
        .when(g["same"], "CONFLATED")
        .when(F.col("national_tag"), "ERROR_NATIONAL_BORDER")
        .when(F.col("unexpected_tag").isNotNull(), "ERROR_UNEXPECTED_TAG")
        .when(F.col("share_national_way").isNotNull(), "ERROR_NODE_IN_NATIONAL_BORDER")
        .when(F.col("share_other_way").isNotNull(), "ERROR_NODE_IN_OTHER_WAYS")
        .when(F.col("rel_other_id").isNotNull(), "ERROR_NODE_IN_OTHER_RELATION")
        .when(F.col("rel_national_id").isNotNull(), "ERROR_NODE_IN_NATIONAL_RELATION")
        .when(F.col("tagged_node_ids").isNotNull(), "ERROR_NODES_WITH_TAGS")
        .when(g["endpoint_dist_m"] > max_endpoint_m, "ERROR_END_POINTS_FAR_APART")
        .otherwise("CHECKED_POSSIBLE")
    )
    context = (
        F.when(F.col("unexpected_tag").isNotNull() & (verdict == "ERROR_UNEXPECTED_TAG"), F.col("unexpected_tag"))
        .when(verdict == "ERROR_NODE_IN_NATIONAL_BORDER", F.col("share_national_way").cast("string"))
        .when(verdict == "ERROR_NODE_IN_OTHER_WAYS", F.col("share_other_way").cast("string"))
        .when(verdict == "ERROR_NODE_IN_OTHER_RELATION", F.col("rel_other_id").cast("string"))
        .when(verdict == "ERROR_NODE_IN_NATIONAL_RELATION", F.col("rel_national_id").cast("string"))
        .when(verdict == "ERROR_NODES_WITH_TAGS", F.col("tagged_node_ids"))
        .when(
            verdict == "ERROR_END_POINTS_FAR_APART",
            F.floor(g["endpoint_dist_m"]).cast("long").cast("string"),
        )
    )
    scored = matched.select(
        "way_id",
        "n_rels",
        verdict.alias("verdict"),
        "osm_way_id",
        context.alias("error_context"),
        F.when(g["endpoint_dist_m"] < float("inf"), F.round(g["endpoint_dist_m"], 3)).alias(
            "endpoint_dist_m"
        ),
        F.round(g["hausdorff_m"], 3).alias("hausdorff_m"),
    )

    # unmatched branches (0 or >1 candidates, >=3 relations)
    unmatched = ways.filter((F.col("n_cands") != 1) | (F.col("n_rels") > 2))
    u_verdict = (
        F.when(F.col("n_rels") >= 3, "ERROR_OVERLAPPING_WAYS")
        .when((F.col("n_rels") == 2) & (F.col("n_cands") == 0), "ERROR_SHARED_WAY_NOT_FOUND")
        .when((F.col("n_rels") == 2) & (F.col("n_cands") > 1), "ERROR_MULTIPLE_SHARED_WAYS")
        .when((F.col("n_rels") == 1) & (F.col("n_cands") == 0), "ERROR_WAY_NOT_FOUND")
        .otherwise("ERROR_MULTIPLE_SINGLE_WAY")
    )
    u_context = F.when(
        F.col("n_cands") > 1,
        F.array_join(F.transform(F.col("cand_ids"), lambda x: x.cast("string")), ","),
    )
    unmatched_out = unmatched.select(
        "way_id",
        "n_rels",
        u_verdict.alias("verdict"),
        F.lit(None).cast("long").alias("osm_way_id"),
        u_context.alias("error_context"),
        F.lit(None).cast("double").alias("endpoint_dist_m"),
        F.lit(None).cast("double").alias("hausdorff_m"),
    )
    return scored.unionByName(unmatched_out)
