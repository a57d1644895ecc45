"""Bloom-filter build + probe-side join pruning.

The scale gap this fills: a semi-join whose dim side is too big to
broadcast (conflation.py:379-384 documents the same swap for the
node-tag probe). A Bloom filter compresses 10^9 dim keys into a fixed
bit budget, ships THAT to every probe task, and filters the fact table
map-side before any wide join — the classic runtime-filter pushdown
(Spark's own spark.sql.optimizer.runtimeFilter.bloomFilter does this
opaquely; here it is explicit and cross-engine deterministic so the
DuckDB oracle can replay bit-for-bit, false positives included).

Hash family: the repo-standard portable stable_hash64
(md5 → first 15 hex chars → BIGINT, < 2^60), rehashed affinely
pos_i = (h·(2i+1) + i·2654435769) mod m for i < k — h·(2k−1) stays
below 2^63 for k ≤ 4, so every term is exact signed-64 arithmetic in
Spark, DuckDB, and Python alike.

Representation: the filter is ONE row holding the sorted array of SET
bit positions (array<long>), built by a distinct + collect_set
aggregate — compact while set-bit count ≪ m, which is exactly the
regime where a Bloom filter beats shipping the keys. At real scale
(m = 2^30+) swap the position array for a packed long[] bitmap with
the same positions — the hash family, the probe predicate, and every
count below are unchanged; only the membership container differs.

False positives are NOT noise here: with a deterministic hash family
they are a deterministic set, so the gate pins the exact
false-positive count — the honest accounting most bloom demos skip.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

GOLDEN = 2654435769  # 2^32 / phi — the repo's affine rehash constant


def _stable_hash64(col) -> F.Column:
    """Portable md5-based 60-bit hash of the key's string form (the
    '0:' domain prefix matches the oracle family in queries.py)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("0:"), col.cast("string"))), 1, 15), 16, 10
    ).cast("long")


def _positions(h: F.Column, m: int, k: int) -> list[F.Column]:
    if k > 4:
        raise ValueError("k > 4 would overflow signed-64 in h*(2k-1)")
    return [((h * (2 * i + 1) + i * GOLDEN) % m) for i in range(k)]


def bloom_build(dim: DataFrame, key_col: str, m: int = 8192, k: int = 3) -> DataFrame:
    """→ single row (bits: array<long>): sorted distinct set-bit
    positions over the dim keys. The explode is map-side; distinct
    collapses to ≤m values before the single-row aggregate."""
    h = _stable_hash64(F.col(key_col))
    return (
        dim.select(F.explode(F.array(*_positions(h, m, k))).alias("p"))
        .distinct()
        .agg(F.sort_array(F.collect_set("p")).alias("bits"))
    )


def _member_cond(key_col: str, m: int, k: int) -> F.Column:
    h = _stable_hash64(F.col(key_col))
    cond = None
    for p in _positions(h, m, k):
        c = F.array_contains(F.col("bits"), p)
        cond = c if cond is None else (cond & c)
    return cond


def bloom_flag(fact: DataFrame, key_col: str, bits: DataFrame, m: int = 8192, k: int = 3) -> DataFrame:
    """fact + (pass_bloom: boolean). The bits row is a broadcast
    nested-loop of cardinality 1 — effectively a map-side closure; the
    membership test is pure JVM array_contains, no shuffle of the fact
    side."""
    return (
        fact.join(F.broadcast(bits))
        .withColumn("pass_bloom", _member_cond(key_col, m, k))
        .drop("bits")
    )


def bloom_prune(fact: DataFrame, key_col: str, bits: DataFrame, m: int = 8192, k: int = 3) -> DataFrame:
    """Filter `fact` to rows whose key passes the filter (all k bit
    positions set)."""
    return bloom_flag(fact, key_col, bits, m, k).filter(F.col("pass_bloom")).drop(
        "pass_bloom"
    )


# planner thresholds (executor-memory-derived at real scale; pinned
# here so the gate's decision is deterministic): a dim under
# BROADCAST_MAX_KEYS broadcasts its raw keys (exact, no FPs); between
# that and BLOOM_MAX_KEYS the bloom bits broadcast (fixed size, FPs
# re-checked by the later join); past it the semi-join must shuffle.
BROADCAST_MAX_KEYS = 10
BLOOM_MAX_KEYS = 1_000_000


def pick_semi_strategy(n_dim_keys: int) -> str:
    """Choose how a fact-side semi-filter against a dim-key set should
    execute — the sibling of spatial_join.pick_geotag_strategy for
    relational pruning. One bounded count on the dim side drives it;
    the fact side is never counted.

      broadcast : dim keys fit an executor — exact hash semi-join,
                  fact never shuffles, no false positives.
      bloom     : keys too many to ship, but the BIT ARRAY is fixed
                  size — filter map-side, accept deterministic FPs,
                  and let the real join (which still runs) discard
                  them. This is where runtime-filter pushdown lives.
      shuffle   : dim too big even for useful bloom density — pay the
                  hash-partitioned semi-join on both sides.
    """
    if n_dim_keys <= BROADCAST_MAX_KEYS:
        return "broadcast"
    if n_dim_keys <= BLOOM_MAX_KEYS:
        return "bloom"
    return "shuffle"
