"""Distributed greedy maximal matching — locally-dominant-edge rounds.

The parallel classic (Preis / Hoepman): every alive vertex proposes its
min-(w,u,v) incident edge; an edge BOTH of whose endpoints propose it
is LOCALLY DOMINANT — lighter than every edge touching it — so the
sequential greedy-by-weight matching must contain it. All dominant
edges join the matching simultaneously, their endpoints leave the
graph, and the next round runs on the residual. With distinct weights
the fixpoint equals sequential greedy EXACTLY (induction: the global
min edge is always dominant; remove its endpoints and recurse), which
is what the differential test pins against a python greedy.

Each round is two equi-joins (alive-filter), one per-vertex min-struct
aggregate and one count-2 group — all shuffles on vertex/edge keys,
nothing quadratic, no driver row loop. Rounds are O(log n) expected on
scrambled weights (adversarial sorted-path weights degrade to O(n) —
callers with such inputs should pre-scramble by hashing the weight's
tie-break, exactly how the gate world is built). Per-round
localCheckpoints cut the otherwise round-multiplicative lineage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def greedy_matching(nodes: DataFrame, edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """nodes(id) + undirected edges(u, v, w) with DISTINCT w ->
    matched edge set (u, v, w) == sequential greedy by ascending w.
    Raises RuntimeError if live edges remain after max_rounds."""
    e = edges.select("u", "v", "w").localCheckpoint(eager=True)
    alive = nodes.select("id").localCheckpoint(eager=True)
    picked = []
    for _ in range(max_rounds):
        au = alive.select(F.col("id").alias("u"))
        av = alive.select(F.col("id").alias("v"))
        live = e.join(au, "u").join(av, "v").localCheckpoint(eager=True)
        if live.count() == 0:  # tiny job on the checkpointed residual
            break
        ek = F.struct("w", "u", "v")
        prop = live.select(F.col("u").alias("vx"), ek.alias("e")).unionAll(
            live.select(F.col("v").alias("vx"), ek.alias("e"))
        )
        best = prop.groupBy("vx").agg(F.min("e").alias("e"))
        dominant = (
            best.groupBy("e")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") == 2)
            .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"), F.col("e.w").alias("w"))
            .localCheckpoint(eager=True)
        )
        picked.append(dominant)
        gone = dominant.select(F.col("u").alias("id")).unionAll(
            dominant.select(F.col("v").alias("id"))
        )
        alive = alive.join(gone, "id", "left_anti").localCheckpoint(eager=True)
        e = live  # residual edge set shrinks with the matching
    else:
        raise RuntimeError(f"greedy_matching: live edges after {max_rounds} rounds")
    if not picked:
        return edges.select("u", "v", "w").limit(0)
    out = picked[0]
    for fr in picked[1:]:
        out = out.unionAll(fr)
    return out


def stable_matching(
    prefs_m: DataFrame, prefs_w: DataFrame, n: int, max_rounds: int = 256
) -> DataFrame:
    """Stable marriage by PARALLEL deferred acceptance (Gale-Shapley
    1962): every free man proposes to his next-ranked woman in the
    SAME round, each woman keeps the best of her suitors plus her
    current fiance, displaced men rejoin the pool. The outcome of
    deferred acceptance is independent of proposal order — batch
    rounds, sequential steps, any interleaving all land on the unique
    MAN-OPTIMAL stable matching — which is what makes the parallel
    form gateable against a strictly sequential replay.

    prefs_m: (m, w, rm) — man m ranks woman w at rm (0 best; each
    man's rm a permutation). prefs_w: (w, m, rw) likewise. Returns
    (w, m) for the n matched pairs. Each round is two equi joins
    (proposal target by rank, then the woman's rank of the suitor),
    one per-woman min-struct arbitration, and a set subtraction for
    the displaced — vertex-partitioned shuffles over the FREE men
    only, so rounds shrink as the matching fills. RAISES if the pool
    is not drained within max_rounds (an unmatched man with exhausted
    preferences is impossible for complete preference lists)."""
    from pyspark.sql import Observation

    spark = prefs_m.sparkSession
    pm = prefs_m.select("m", "w", "rm").localCheckpoint(eager=True)
    pw = prefs_w.select(
        F.col("w").alias("pw_w"), F.col("m").alias("pw_m"), "rw"
    ).localCheckpoint(eager=True)
    # state parallelism follows the preference tables — a 16-row gate
    # instance runs 1-partition rounds instead of 32 near-empty tasks
    parts = max(1, pm.rdd.getNumPartitions())
    state = (
        spark.range(n)
        .coalesce(parts)
        .select(
            F.col("id").alias("m"),
            F.lit(0).cast("long").alias("nxt"),
            F.lit(None).cast("long").alias("w_cur"),
        )
        .localCheckpoint(eager=True)
    )
    # uniquely-named copies so lazily CHAINED rounds (below) never hit
    # ambiguous self-join attribute resolution
    pm2 = pm.select(
        F.col("m").alias("pm_m"), F.col("w").alias("pm_w"), F.col("rm").alias("pm_rm")
    )

    def one_round(state: DataFrame) -> DataFrame:
        free = state.filter(F.col("w_cur").isNull() & (F.col("nxt") < n))
        props = (
            free.join(pm2, (F.col("m") == F.col("pm_m")) & (F.col("nxt") == F.col("pm_rm")))
            .select(F.col("pm_m").alias("cand_m"), F.col("pm_w").alias("w"))
        )
        bids = props.unionByName(
            state.filter(F.col("w_cur").isNotNull()).select(
                F.col("m").alias("cand_m"), F.col("w_cur").alias("w")
            )
        )
        scored = bids.join(
            pw, (F.col("w") == F.col("pw_w")) & (F.col("cand_m") == F.col("pw_m"))
        ).select("w", "cand_m", "rw")
        winners = (
            scored.groupBy("w")
            .agg(F.min(F.struct("rw", "cand_m")).alias("b"))
            .select(F.col("b.cand_m").alias("m"), F.col("w").alias("w_new"))
        )
        # each man's rm is a permutation, so a free man matches exactly
        # one pm row — props is already unique per cand_m (no distinct,
        # no extra exchange before the left join below)
        proposed = props.select(F.col("cand_m").alias("m"))
        return (
            state.join(winners, "m", "left")
            .join(proposed.withColumn("did", F.lit(1)), "m", "left")
            .select(
                "m",
                (F.col("nxt") + F.coalesce(F.col("did"), F.lit(0))).alias("nxt"),
                F.col("w_new").alias("w_cur"),
            )
        )

    # CHUNKED rounds: each action costs ~1.5 s of fixed job/checkpoint
    # overhead on a small instance regardless of data size (the 16-man
    # gate instance ran 21 one-round actions = 33 s of pure overhead),
    # so several rounds share one checkpoint+observe action. Each
    # intermediate round is LAZILY persisted: a round references its
    # predecessor state three times (free pool, engaged bids, update
    # join), and without the shared in-memory relation the chunk's plan
    # re-executes each earlier round 3x per reference (3^k blowup — the
    # first chunked attempt did exactly that). A round with no free men
    # is the identity (no proposals, every woman re-selects her fiance),
    # so running past convergence inside a chunk cannot change the
    # state — order-independence covers batched rounds of any size.
    chunk = 4
    done = 0
    while done < max_rounds:
        obs = Observation()
        cached = []
        for _ in range(min(chunk, max_rounds - done)):
            state = one_round(state).persist()
            cached.append(state)
            done += 1
        state = state.observe(
            obs,
            F.sum(
                (F.col("w_cur").isNull() & (F.col("nxt") < n)).cast("long")
            ).alias("free"),
        ).localCheckpoint(eager=True)
        for c in cached:
            c.unpersist()
        if (obs.get["free"] or 0) == 0:
            break
    else:
        raise RuntimeError(f"stable_matching: pool not drained in {max_rounds} rounds")
    return state.select(F.col("w_cur").alias("w"), "m")
