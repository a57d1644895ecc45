"""Distributed suffix-array construction by prefix doubling.

The scale problem: sorting the suffixes of a string of length L by
materializing them costs O(L^2) bytes and O(L) per comparison — the
shape DuckDB (our oracle) can afford at gate scale and a 100 TB corpus
cannot. Prefix doubling (Manber-Myers) keeps O(L log L) *integer* rows
instead: after round k every position holds the rank of its length-k
prefix, and the rank of the length-2k prefix is the dense rank of the
pair (rank[i], rank[i+k]).

Spark-first shape: one row per (doc_id, pos); each round is a
`lead(rank, k)` plus a `dense_rank` over a window partitioned by
doc_id — no joins, no shuffles beyond the initial partition-by-doc
(Catalyst keeps all six rounds in one sort-based window stage chain
per partition). Documents are independent, so a 100 TB corpus
parallelizes per doc with skew bounded by the truncation length; for
single giant strings the identical doubling runs with global ranks
(sort-based dense rank via plans/dense_index.py) — same algebra, one
extra shuffle per round.

A suffix is never equal to another suffix of the same document
(lengths differ and the shorter would otherwise be a strict prefix,
making the longer one greater), so the final ranks are a permutation
of 1..len — ties cannot survive the last round. Shorter-prefix rows
(lead returns NULL past the end) sort FIRST, matching binary string
order where a prefix precedes its extensions.

Reference analogue: none (the reference has no text stack); this is
the exact-substring backbone complementing the 8-token-gram dedup
(queries.q_exact_substring_spans, Lee et al.).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def suffix_array(docs: DataFrame, max_len: int = 64, base_k: int = 8) -> DataFrame:
    """(doc_id, text) -> (doc_id, pos, sa_rank): per-document suffix
    array over the first `max_len` characters; sa_rank is the 1-based
    sort order of the suffix starting at 1-based pos.

    ``base_k`` is the standard Manber-Myers wide-base refinement: the
    first round ranks the length-``base_k`` substring directly (string
    order over a short fixed-width key — the same order rule, since a
    shorter prefix sorts before its extensions), then doubling proceeds
    from k=base_k. At max_len=64 this is 7 window sorts instead of 13
    (each Sort+Window pair over the per-doc rows cost ~0.17 s at sf0.1
    regardless of data size — per-operator overhead, guide §1.2); the
    permutation produced is identical (pytest-differential vs a Python
    suffix sort, plus the sum(pos*rank) oracle checksum)."""
    t = docs.select(
        "doc_id", F.substring("text", 1, max_len).alias("t")
    ).filter(F.length("t") > 0)
    bk = max(1, min(base_k, max_len))
    rows = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("t"))).alias("pos"),
        "t",
    ).select("doc_id", "pos", F.expr(f"substring(t, pos, {bk})").alias("pfx"))
    w = Window.partitionBy("doc_id")
    # base round: rank of the length-bk prefix = per-doc dense rank of
    # the substring (string order: a short prefix sorts before its
    # extensions, exactly the NULLS FIRST rule of the doubling rounds)
    cur = rows.select(
        "doc_id",
        "pos",
        F.dense_rank().over(w.orderBy("pfx")).alias("rank"),
    )
    k = bk
    while k < max_len:
        wp = w.orderBy("pos")
        paired = cur.select(
            "doc_id", "pos", "rank", F.lead("rank", k).over(wp).alias("r2")
        )
        cur = paired.select(
            "doc_id",
            "pos",
            F.dense_rank()
            .over(w.orderBy(F.col("rank"), F.col("r2").asc_nulls_first()))
            .alias("rank"),
        )
        k *= 2
    return cur.withColumnRenamed("rank", "sa_rank")
