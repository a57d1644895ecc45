"""Scale-leg evidence beyond sf0.1 (VERDICT r06 #5): replicate the
sf0.1 tables Rx with consistent key offsets, run the SAME headline
bench at both scales, and record wall-time growth per query vs the Rx
data growth in BENCH/notes.md — the "would this survive 100x" check
executed rather than argued.

Replication is key-consistent (joins keep working: orders.o_custkey and
customer.c_custkey get the same per-replica offset, lineitem follows
orders/part/supplier) and content-DIVERSE for documents: replica text
is transformed (reverse / vowel-rotate / case-fold variants) so the
corpus keeps its duplicate density instead of becoming R near-copies of
itself — replicating text verbatim would make every dedup candidate
bucket R times deeper and measure a DATA artifact (R^2 candidate
pairs), not engine scaling. Dims (region, nation) stay fixed, as they
would at 100 TB.

Usage: python tools/scaleup_bench.py [R]    (default R=4)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def build_scaled_dir(spark, base: str, out: str, R: int) -> None:
    import pyspark.sql.functions as F

    os.makedirs(out, exist_ok=True)
    # per-replica key offsets, far above any base key range
    OFF = {
        "orderkey": 10_000_000,
        "custkey": 1_000_000,
        "partkey": 1_000_000,
        "suppkey": 100_000,
        "doc_id": 100_000_000,
        "event_id": 100_000_000,
        "user_id": 10_000_000,
        "vec_id": 1_000_000,
    }

    def offset_cols(df, r: int, cols: dict):
        for c, unit in cols.items():
            df = df.withColumn(c, F.col(c) + F.lit(r * unit))
        return df

    def text_variant(col, r: int):
        # genuinely different bytes per replica, same length profile
        if r % 3 == 1:
            return F.reverse(col)
        if r % 3 == 2:
            return F.translate(col, "aeiou", "uoiea")
        return col

    for t in TABLES:
        df = spark.read.parquet(f"{base}/{t}.parquet")
        if t in ("region", "nation"):
            parts = [df]  # dims stay fixed
        else:
            parts = []
            for r in range(R):
                p = df
                if t == "orders":
                    p = offset_cols(p, r, {"o_orderkey": OFF["orderkey"], "o_custkey": OFF["custkey"]})
                elif t == "lineitem":
                    p = offset_cols(p, r, {
                        "l_orderkey": OFF["orderkey"],
                        "l_partkey": OFF["partkey"],
                        "l_suppkey": OFF["suppkey"],
                    })
                elif t == "customer":
                    p = offset_cols(p, r, {"c_custkey": OFF["custkey"]})
                elif t == "part":
                    p = offset_cols(p, r, {"p_partkey": OFF["partkey"]})
                elif t == "supplier":
                    p = offset_cols(p, r, {"s_suppkey": OFF["suppkey"]})
                elif t == "events":
                    p = offset_cols(p, r, {"event_id": OFF["event_id"], "user_id": OFF["user_id"]})
                elif t == "documents":
                    p = offset_cols(p, r, {"doc_id": OFF["doc_id"]})
                    p = p.withColumn("text", text_variant(F.col("text"), r))
                elif t == "embeddings":
                    p = offset_cols(p, r, {"vec_id": OFF["vec_id"]})
                parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"  scaled {t}: x{len(parts) if t not in ('region','nation') else 1}", flush=True)


def run_bench_leg(sf_dir: str, tag: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    # fresh world dirs per leg (bench names them by _sf_from_dir)
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench leg {tag} produced no JSON: {p.stderr[-2000:]}")
    doc = json.loads(lines[-1])
    print(f"  leg {tag}: headline {doc['value']}s (wall {time.time()-t0:.0f}s)", flush=True)
    return doc


def main() -> None:
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    scaled = f"/tmp/sf_scaled_x{R}"
    from osm_admin_boundary_conflation_spark.session import build_session

    spark = build_session(app_name="scaleup-datagen")
    print(f"building {scaled} = {R}x {BASE} ...", flush=True)
    build_scaled_dir(spark, BASE, scaled, R)
    spark.stop()

    # scaled leg FIRST: each bench run rewrites BENCH/notes.md's skew
    # section for its own SF_DIR, and the canonical skew numbers should
    # stay the sf0.1 ones (written by the second leg)
    scaled_doc = run_bench_leg(scaled, f"sf0.1x{R}")
    base_doc = run_bench_leg(BASE, "sf0.1")

    rows = []
    for q, t1 in sorted(base_doc["queries"].items()):
        tR = scaled_doc["queries"].get(q)
        if tR is None:
            continue
        ratio = round(tR / t1, 2) if t1 > 0.05 else None
        if ratio is None or t1 < 0.3:
            verdict = "fixed-cost dominated (sub-second at both scales)" if (tR or 0) < 1.5 else "grew from sub-second base"
        elif ratio <= R * 1.15:
            verdict = f"linear-or-better (≤{R}x)"
        else:
            verdict = f"SUPER-LINEAR ({ratio}x time for {R}x data)"
        rows.append((q, t1, tR, ratio, verdict))

    lines = [
        "",
        f"## Scale-leg evidence: sf0.1 vs {R}x-replicated sf0.1 (tools/scaleup_bench.py)",
        "",
        f"Same headline bench, same host, back-to-back legs; data {R}x",
        "(key-consistent replication, per-replica text variants so dedup",
        "candidate density stays constant; dims fixed). min-of-3 per query",
        "per leg. A query is flagged SUPER-LINEAR when time grows more",
        f"than {R}x (+15% noise allowance) for {R}x data.",
        "",
        "| query | sf0.1 s | x{R} s | ratio | verdict |".replace("{R}", str(R)),
        "|---|---|---|---|---|",
    ]
    for q, t1, tR, ratio, verdict in rows:
        lines.append(f"| {q} | {t1} | {tR} | {ratio if ratio is not None else '-'} | {verdict} |")
    lines.append("")
    lines.append(
        f"Headline totals: {base_doc['value']}s at sf0.1 vs {scaled_doc['value']}s at {R}x."
    )
    lines.append("")

    notes = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "notes.md")
    with open(notes, "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
