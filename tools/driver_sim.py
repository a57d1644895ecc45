"""Local simulation of the driver's correctness gate.

Runs every queries() entry on Spark at sf0.01 AND its oracle_sql() on
DuckDB over the same parquet views, compares row count, column names,
and order-insensitive value content (sorted columns, sorted rows,
doubles rounded to 9 significant-ish decimals before compare).

Usage: python tools/driver_sim.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def fresh_con():
    """One DuckDB connection PER ORACLE. A DuckDB INTERNAL error (engine
    bug, not SQL error) invalidates the whole connection, so a shared
    connection lets one fatal oracle cascade into failures for every
    subsequent query (VERDICT r05 #1: segment_crossing_join poisoned
    contribution_analysis). Views are cheap to recreate."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def materialize_worlds(spark, sf_dir: str) -> None:
    """Materialize the synthetic OSM + strip worlds to parquet once per
    run (exactly what bench.py's setup does) so the conflate/segment
    family plans read scans instead of re-deriving the inline synthetic
    world per query — VERDICT r06 item 3: gate plans drop from ~183
    scans / 229 shuffles to a handful, and audits stop needing the
    "inline synthetic world" annotation. Respects pre-set env vars so a
    caller (or bench) can point at an existing world."""
    import os

    from osm_admin_boundary_conflation_spark import datagen_osm

    tag = os.path.basename(sf_dir.rstrip("/"))
    # The worlds are deterministic per sf_dir, so a completed copy is
    # REUSED, never rewritten: concurrent driver_sim runs sharing the
    # /tmp path must not yank parquet files out from under each
    # other's in-flight scans. Fresh builds go to a pid-unique tmp dir
    # and atomically rename into place (first writer wins; a loser
    # reuses the winner's copy).
    def _ready(d: str, marker: str) -> bool:
        return os.path.exists(os.path.join(d, marker))

    def _publish(tmp: str, final: str, marker: str) -> None:
        try:
            os.rename(tmp, final)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)  # lost the race: reuse
        assert _ready(final, marker), f"world publish failed: {final}"

    if not os.environ.get("SPARK_GRAFT_WORLD_DIR"):
        wdir = f"/tmp/sim_world_{tag}"
        if not _ready(wdir, "osm_rels/_SUCCESS"):
            tmp = f"{wdir}.tmp.{os.getpid()}"
            datagen_osm.materialize_osm_world(spark, sf_dir, tmp)
            _publish(tmp, wdir, "osm_rels/_SUCCESS")
        os.environ["SPARK_GRAFT_WORLD_DIR"] = wdir
    if not os.environ.get("SPARK_GRAFT_STRIP_DIR"):
        sdir = f"/tmp/sim_strip_{tag}"
        if not _ready(sdir, "_SUCCESS"):
            tmp = f"{sdir}.tmp.{os.getpid()}"
            datagen_osm.materialize_strip_world(spark, sf_dir, tmp)
            _publish(tmp, sdir, "_SUCCESS")
        os.environ["SPARK_GRAFT_STRIP_DIR"] = sdir


def main():
    import __spark_entry__ as E
    from osm_admin_boundary_conflation_spark.session import build_session

    # Accept space- AND comma-separated names; ignore --flags. A name
    # that is not in the registry is a HARD ERROR: a typo'd or
    # comma-joined filter used to match nothing and print "all queries
    # match their oracles" — a vacuous pass that looked like a real one.
    only = {
        n
        for a in sys.argv[1:]
        if not a.startswith("--")
        for n in a.split(",")
        if n
    }
    qs, oracles = E.queries(), E.oracle_sql()
    unknown = sorted(only - set(qs))
    if unknown:
        raise SystemExit(f"unknown query names (not in registry): {unknown}")
    spark = build_session(app_name="driver-sim")
    materialize_worlds(spark, SF_DIR)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"[FAIL] {name}: spark error: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            continue
        con = None
        try:
            con = fresh_con()
            rel = con.sql(oracles[name])
            # Type sweep: the REAL driver fetches oracle results through
            # pandas, where HUGEINT/DECIMAL degrade to float64 ("7.0" vs
            # Spark's "7") — invisible to fetchall()'s exact Python ints.
            # Fail loudly here so the lossy type never reaches the gate
            # (VERDICT r02 #1: events_sessionize red twice for this).
            lossy = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
            ]
            if lossy:
                failures.append((name, f"LOSSY ORACLE TYPES (cast to BIGINT/DOUBLE): {lossy}"))
                print(f"[FAIL] {name}: lossy oracle output types {lossy}")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"[FAIL] {name}: oracle error: {str(ex)[:300]}")
            continue
        finally:
            if con is not None:
                try:
                    con.close()
                except Exception:
                    pass
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            failures.append((name, f"columns differ: spark={sc} duck={dc}"))
            print(f"[FAIL] {name}: columns spark={sc} duck={dc}")
        elif len(sr) != len(dr):
            failures.append((name, f"row count: spark={len(sr)} duck={len(dr)}"))
            print(f"[FAIL] {name}: rows spark={len(sr)} duck={len(dr)}")
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"[FAIL] {name}: values differ e.g. {diff}")
        else:
            print(f"[OK]   {name}: {len(sr)} rows, {time.time()-t0:.1f}s")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
