"""Version-keyed query-result cache over the snapshot-table layer.

Materialized-view caching with PRECISE invalidation: a cache entry
stores the result parquet plus the exact snapshot VERSION of the input
table it was computed from. A later lookup compares that pinned version
with the table's current head — equal means the cached result is
provably current (snapshot commits are the only way the table changes,
and versions are totally ordered), different means stale and the entry
is recomputed and atomically replaced. This is the semantic-cache shape
warehouse engines bolt onto immutable table formats: correctness comes
from the format's versioning, not from TTLs or mtime heuristics.

Entry layout: ``<root>/<key>/meta.json`` (pinned version + data dir
name) and ``<root>/<key>/data-<uuid>/`` result parquet. The swap is
data-first then an atomic ``os.replace`` of meta.json (the same
discipline as snapshot commits), so a reader never sees a half-written
entry; superseded data dirs are reclaimed by ``sweep_cache``.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..sources import snapshot_table as ST


def cached_result(
    spark: SparkSession,
    table_location: str,
    cache_root: str,
    key: str,
    compute,
    max_retries: int = 3,
) -> tuple[DataFrame, str]:
    """Return (result_df, status); status in 'hit' / 'miss' / 'stale' /
    'uncached' (the exhausted-retries fallback: the result is computed
    and returned but NOT published — a concurrent writer kept moving
    the head; the fallback's data dir stays inside the entry until
    sweep_cache reclaims it).

    ``compute()`` must return the result DataFrame derived from the
    CURRENT head of the table at ``table_location``. On hit, the result
    is served from the cache parquet — the base table is not touched.

    The head is read BEFORE compute() and re-read AFTER materializing
    the result; if a commit landed in between, the entry is NOT
    published under the pre-compute version (that would pin a result
    derived from a newer head to an older version — mislabeling, ADVICE
    r06) — instead compute is retried against the new head, up to
    ``max_retries`` times, after which the fresh result is returned
    uncached.
    """
    entry = os.path.join(cache_root, key)
    meta_p = os.path.join(entry, "meta.json")
    for _attempt in range(max_retries):
        versions = ST._versions(table_location)
        if not versions:
            raise FileNotFoundError(f"no snapshots at {table_location}")
        cur = max(versions)
        status = "miss"
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            if meta["table_version"] == cur:
                return spark.read.parquet(os.path.join(entry, meta["data"])), "hit"
            status = "stale"
        df = compute()
        dname = f"data-{uuid.uuid4().hex[:12]}"
        ddir = os.path.join(entry, dname)
        df.write.mode("overwrite").parquet(ddir)
        after = max(ST._versions(table_location))
        if after != cur:
            # Concurrent commit: the materialized result derives from
            # some head in [cur, after] — unsafe to pin. Retry.
            shutil.rmtree(ddir, ignore_errors=True)
            continue
        os.makedirs(entry, exist_ok=True)
        tmp = meta_p + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"table_version": cur, "data": dname}, f)
        os.replace(tmp, meta_p)
        return spark.read.parquet(ddir), status
    # Head kept moving: serve the latest computed result uncached.
    df = compute()
    dname = f"data-{uuid.uuid4().hex[:12]}"
    ddir = os.path.join(entry, dname)
    df.write.mode("overwrite").parquet(ddir)
    return spark.read.parquet(ddir), "uncached"


def sweep_cache(cache_root: str) -> int:
    """The vacuum-style sweep the entry layout plans for: delete every
    ``data-*`` dir not referenced by its entry's current meta.json
    (superseded results from stale refreshes and abandoned uncached
    attempts). Returns the number of dirs removed. Safe against
    concurrent refreshes only in the same single-writer regime as the
    snapshot layer's vacuum."""
    removed = 0
    if not os.path.isdir(cache_root):
        return 0
    for key in sorted(os.listdir(cache_root)):
        entry = os.path.join(cache_root, key)
        if not os.path.isdir(entry):
            continue
        meta_p = os.path.join(entry, "meta.json")
        live = None
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                live = json.load(f).get("data")
        for d in sorted(os.listdir(entry)):
            if d.startswith("data-") and d != live:
                shutil.rmtree(os.path.join(entry, d), ignore_errors=True)
                removed += 1
    return removed
