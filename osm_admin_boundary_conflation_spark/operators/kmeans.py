"""Distributed Lloyd's k-means over an embedding column (IVF training).

The reference has no ANN surface; this is part of the engine's
training-data-pipeline extensions (SURVEY §6): ann_ivf_topk consumes a
"trained" inverted index — this operator trains one, as pure DataFrame
ops (no MLlib, no driver-side math):

  posexplode(embedding) → per-dimension rows
  init: centroids = the k smallest vec_ids (deterministic)
  per iteration (fixed count — deterministic, resumable):
    assign: broadcast centroids, groupBy(vec_id, cid) Σ(v−c)² →
            row_number over (d², cid) — ties break on centroid id
    update: groupBy(cid, i) avg(v)

Scale shape: each iteration is one broadcast join + two aggregations on
well-distributed keys; the centroid table is k×dims rows (tiny,
broadcast). Iteration count is a fixed parameter, so the lineage is a
static DAG — checkpointable between iterations at real scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def explode_vectors(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.select(
        "vec_id", F.posexplode(vec_col).alias("i", "v")
    ).withColumn("v", F.col("v").cast("double"))


def lloyd_assignments(emb: DataFrame, k: int = 8, iterations: int = 2) -> DataFrame:
    """→ (vec_id, cid): cluster assignment after `iterations` rounds."""
    ev = explode_vectors(emb)
    cent = ev.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), "i", F.col("v").alias("cv")
    )
    assign = None
    for _ in range(iterations):
        d2 = (
            ev.join(F.broadcast(cent), "i")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))).alias("d2"))
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        assign = (
            d2.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select("vec_id", "cid")
        )
        cent = (
            ev.join(assign, "vec_id")
            .groupBy("cid", "i")
            .agg(F.avg("v").alias("cv"))
        )
    return assign


def cluster_stats(emb: DataFrame, k: int = 8, iterations: int = 2) -> DataFrame:
    """→ (cid, n_members, min_vec, max_vec): order-independent summary
    of the trained clustering (no float centroid values in the output —
    cross-engine float summation order must not affect the compare)."""
    a = lloyd_assignments(emb, k, iterations)
    return a.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
    )
