"""Skew-hardening shape + correctness tests for the token aggregations.

VERDICT r03 item 5: `cooccurrence_counts` and `inverted_index` group on
raw tokens; a Zipfian corpus concentrates a stop-word on one reducer.
These tests pin (a) the plan shapes that make that safe — map-side
partial aggregation for the counts, a salted (term, salt) exchange for
the posting lists — and (b) exact results on an adversarial corpus
where 90% of all token mass is ONE token.
"""

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark.queries import QUERIES


def _skew_docs(spark, tmp_path):
    """1000 docs; every doc contains 'the' (plus 9 fillers), so 'the'
    has df=1000 and ~90% of distinct-pair mass flows through it."""
    rows = [
        (i, "web", "the " + " ".join(f"w{(i + j) % 25}" for j in range(3)), 0)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string, n_chars long")
    path = str(tmp_path / "skew")
    df.write.parquet(f"{path}/documents.parquet")
    return path


def _python_cooccurrence(rows):
    from collections import Counter

    c = Counter()
    for _, text in rows:
        toks = sorted(set(text.strip().lower().split()))
        for i in range(len(toks)):
            for j in range(i + 1, len(toks)):
                c[(toks[i], toks[j])] += 1
    return {k: v for k, v in c.items() if v >= 50}


def test_cooccurrence_exact_on_skewed_corpus(spark, tmp_path):
    path = _skew_docs(spark, tmp_path)
    got = {
        (r.t1, r.t2): r.n_docs for r in QUERIES["cooccurrence_counts"](spark, path).collect()
    }
    docs = spark.read.parquet(f"{path}/documents.parquet")
    want = _python_cooccurrence([(r.doc_id, r.text) for r in docs.collect()])
    assert got == want
    assert any("the" in pair for pair in got), "hot token must appear in output"


def test_cooccurrence_plan_partial_agg_and_semantic_prune(spark, tmp_path):
    """The final pair groupBy must run a map-side partial aggregate
    (reducer input is one partial per map task per key, the reason no
    explicit salt stage is needed for count(*)), and the df>=50
    semantic prune must appear as a semi join before the self-join.
    Plan shape only — input built under tmp_path so the test has no
    dependence on any machine-specific dataset path (ADVICE r04)."""
    plan = (
        QUERIES["cooccurrence_counts"](spark, _skew_docs(spark, tmp_path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in plan
    assert "LeftSemi" in plan


def test_inverted_index_exact_on_skewed_corpus(spark, tmp_path):
    path = _skew_docs(spark, tmp_path)
    got = {r.term: (r.df, r.tf_total, r.postings_head)
           for r in QUERIES["inverted_index"](spark, path).collect()}
    assert got["the"][0] == 1000 and got["the"][1] == 1000
    # smallest 12 doc ids, sorted, regardless of which salt owned them
    assert got["the"][2] == ",".join(str(i) for i in range(12))
    # a tail token: w0 appears in docs where (i+j)%25==0 for j in 0..2
    w0_docs = sorted({i for i in range(1000) for j in range(3) if (i + j) % 25 == 0})
    assert got["w0"][0] == len(w0_docs)
    assert got["w0"][2] == ",".join(str(i) for i in w0_docs[:12])


def test_inverted_index_plan_salted_exchange(spark, tmp_path):
    """The first exchange must partition on (term, salt) — the hot
    term's posting state is spread across 32 tasks, none of which owns
    the full posting set."""
    plan = (
        QUERIES["inverted_index"](spark, _skew_docs(spark, tmp_path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # the salt alias folds to _groupingexpression in the physical plan;
    # what matters is that the first aggregate exchanges on term PLUS
    # the salt key (and, via the fused count-distinct, doc_id too)
    m = re.search(r"hashpartitioning\(term#\d+, (?:salt|_groupingexpression)", plan)
    assert m, "expected a (term, salt) exchange in:\n" + plan


def test_skyline_salted_equals_plain(spark):
    """Differential: salted two-phase frontier == single-window frontier
    on pseudo-random points (with deliberate ties on both axes)."""
    from osm_admin_boundary_conflation_spark.operators.skyline import (
        skyline,
        skyline_salted,
    )

    rows = [(i, (i * 37) % 50, (i * 61) % 40) for i in range(300)]
    # plant exact ties at the corner so tied frontier points both survive
    rows += [(1000, 49, 39), (1001, 49, 39)]
    df = spark.createDataFrame(rows, "doc_id long, a long, b long")
    plain = {(r.doc_id) for r in skyline(df, "a", "b").collect()}
    salted = {(r.doc_id) for r in skyline_salted(df, "a", "b", "doc_id").collect()}
    assert plain == salted and {1000, 1001} <= plain

    # python quadratic reference
    def dominated(p):
        return any(
            q[1] >= p[1] and q[2] >= p[2] and (q[1] > p[1] or q[2] > p[2])
            for q in rows
            if q is not p
        )

    want = {p[0] for p in rows if not dominated(p)}
    assert plain == want
