"""Tabular entity resolution: multi-blocker candidates + integer scoring.

The reference's conflation IS entity resolution over boundary geometries
(conflate.py pairs OSM relations with registry entities by ref-key, then
name, then geometry agreement); this module is the same decide-if-same
discipline for tabular records at corpus scale, shaped like the classic
Fellegi-Sunter pipeline:

1. BLOCKING — the union of several cheap equi-joins (each blocker is a
   deterministic key: here (nation, stable name-digit slice) and
   (nation, segment)). Pairs that share no blocker are never compared,
   so the candidate set is linear-ish, never the n^2 cross product; the
   union of blockers recovers recall a single blocker loses to field
   noise (the same reason conflate.py falls back from ref-key to name).
2. SCORING — integer agreement weights per field (exact name, small
   edit distance, balance-cents equality, segment equality). Integer
   weights keep the gate exact; real FS log-likelihood weights are a
   monotone transform of the same comparisons.
3. DECISION — a single threshold on the summed score.

All comparisons are JVM-side (levenshtein, equality); the blocker joins
are plain equi-shuffles, so the whole pipeline scales like its worst
blocker's key skew — salt a hot block exactly like prefix_block_pairs
if a registry has one (operators/dedup.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# (score weight, applies-if) agreement rules evaluated on candidate pairs
NAME_EXACT_W = 40
NAME_FUZZY_W = 25  # levenshtein <= 1, only when not exact
CENTS_W = 20
SEG_W = 15


def block_candidates(left: DataFrame, right: DataFrame) -> DataFrame:
    """Union-of-blockers candidate pairs, each pair exactly once.

    left: (lid, name, nat, cents, seg); right: (rid, ...) same shape.
    Blocker 1: (nat, substr(name, 10, 4)) — a digit slice that survives
    the common last-char corruption. Blocker 2: (nat, seg). The union
    is distinct-ed on (lid, rid) so downstream scoring sees each
    candidate once regardless of how many blockers fired.
    """
    def keyed(df, idc, b):
        if b == 1:
            k = F.concat(F.lit("b1:"), F.col("nat").cast("string"), F.lit("|"),
                         F.substring("name", 10, 4))
        else:
            k = F.concat(F.lit("b2:"), F.col("nat").cast("string"), F.lit("|"), F.col("seg"))
        return df.select(F.col(idc), "name", "nat", "cents", "seg", k.alias("bk"))

    pairs = None
    for b in (1, 2):
        l = keyed(left, "lid", b)
        r = keyed(right, "rid", b).select(
            "bk",
            F.col("rid"),
            F.col("name").alias("r_name"),
            F.col("cents").alias("r_cents"),
            F.col("seg").alias("r_seg"),
        )
        p = l.join(r, "bk").select(
            "lid", "name", "cents", "seg", "rid", "r_name", "r_cents", "r_seg"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.dropDuplicates(["lid", "rid"])


def score_pairs(cand: DataFrame) -> DataFrame:
    """Integer Fellegi-Sunter-style agreement score per candidate pair."""
    name_exact = F.col("name") == F.col("r_name")
    name_fuzzy = F.levenshtein("name", "r_name") <= 1
    score = (
        F.when(name_exact, NAME_EXACT_W)
        .when(name_fuzzy, NAME_FUZZY_W)
        .otherwise(0)
        + F.when(F.col("cents") == F.col("r_cents"), CENTS_W).otherwise(0)
        + F.when(F.col("seg") == F.col("r_seg"), SEG_W).otherwise(0)
    )
    return cand.select("lid", "rid", score.cast("long").alias("score"))


def resolve(left: DataFrame, right: DataFrame, threshold: int) -> DataFrame:
    """Blocking + scoring + threshold decision: (lid, rid, score) matches."""
    return score_pairs(block_candidates(left, right)).filter(
        F.col("score") >= threshold
    )


def sorted_neighborhood_pairs(
    records: DataFrame, window: int, bucket_prefix_len: int = 17
) -> DataFrame:
    """Sorted-Neighborhood Method blocking (Hernandez & Stolfo,
    SIGMOD'95): sort all records by the blocking key and compare only
    records within ``window`` positions — the complement of hash
    blocking for keys whose noise is positional (truncations, suffix
    edits) rather than token-level.

    records: (id, name). The GLOBAL rank over (name, id) is computed
    without a single-partition window: records group into
    order-preserving KEY-PREFIX buckets (a prefix comparator is
    monotone in the full key), rank within each bucket in parallel,
    then add bucket offsets from a bounded driver collect of bucket
    counts — the global_row_number shape. Candidate pairs join on the
    rank block (rank div window) with the a-side exploded to its own
    and the following block, so each in-window pair meets exactly
    once. Returns (ia, ib, ra, rb, name_a, name_b) with ra < rb.
    """
    import pyspark.sql.functions as _F
    from pyspark.sql import Window as _W

    keyed = records.select(
        "id", "name", _F.substring("name", 1, bucket_prefix_len).alias("bk")
    )
    per_bucket = keyed.select(
        "id",
        "name",
        "bk",
        _F.row_number().over(_W.partitionBy("bk").orderBy("name", "id")).alias("brn"),
    )
    counts = sorted(
        (r["bk"], r["n"])
        for r in keyed.groupBy("bk").agg(_F.count(_F.lit(1)).alias("n")).collect()
    )
    offs, acc = {}, 0
    for bk, n in counts:
        offs[bk] = acc
        acc += n
    off_df = records.sparkSession.createDataFrame(
        [(bk, off) for bk, off in offs.items()], "bk string, off long"
    )
    ranked = per_bucket.join(_F.broadcast(off_df), "bk").select(
        "id", "name", (_F.col("brn") + _F.col("off")).alias("rank")
    )
    a = ranked.select(
        _F.col("id").alias("ia"),
        _F.col("name").alias("name_a"),
        _F.col("rank").alias("ra"),
        _F.explode(
            _F.array(
                _F.expr(f"(rank - 1) div {window}"),
                _F.expr(f"(rank - 1) div {window} + 1"),
            )
        ).alias("blk"),
    )
    b = ranked.select(
        _F.col("id").alias("ib"),
        _F.col("name").alias("name_b"),
        _F.col("rank").alias("rb"),
        _F.expr(f"(rank - 1) div {window}").alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter((_F.col("rb") > _F.col("ra")) & (_F.col("rb") - _F.col("ra") < window))
        .select("ia", "ib", "ra", "rb", "name_a", "name_b")
    )
