"""silhouette_eval's moment identity vs brute-force pairwise distances."""

import collections

import numpy as np

from osm_admin_boundary_conflation_spark.queries import QUERIES


def _brute_silhouette(vecs):
    # vecs: {vid: (label, int64 vector)}
    bylab = collections.defaultdict(list)
    for v, (lab, _) in vecs.items():
        bylab[lab].append(v)
    out = {}
    for v, (lab, q) in vecs.items():
        def msum(members):
            return sum(int(((q - vecs[j][1]) ** 2).sum()) for j in members)

        a = msum([j for j in bylab[lab] if j != v]) / (len(bylab[lab]) - 1)
        b = min(
            msum(bylab[other]) / len(bylab[other])
            for other in bylab
            if other != lab
        )
        out[v] = round((b - a) / max(a, b), 6)
    return out


def test_moment_silhouette_matches_bruteforce(spark):
    got = {
        r.vec_id: r.sil
        for r in QUERIES["silhouette_eval"](spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    rows = duckdb.sql(
        "SELECT vec_id, label, embedding FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    ).fetchall()
    vecs = {
        v: (lab, np.round(np.array(e, dtype=np.float64) * 1000).astype(np.int64))
        for v, lab, e in rows
    }
    want = _brute_silhouette(vecs)
    assert set(got) == set(want)
    for v in got:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
