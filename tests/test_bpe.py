"""Distributed BPE merge learning (operators/bpe.py): hand-checked
merges on a toy corpus, greedy-replace semantics, and the map-only
apply path."""

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark.operators.bpe import (
    apply_bpe_merges,
    learn_bpe_merges,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_learn_merges_hand_checked(spark):
    # corpus: "abab", "abc" -> pairs: ab x3, ba x1, bc x1 -> merge1 = 'ab'->A
    # stage1: "AA", "Ac" -> pairs: AA x1, Ac x1 -> tie, 'AA' < 'Ac' -> merge2='AA'
    docs = _docs(spark, ["abab", "abc"])
    got = [tuple(r) for r in learn_bpe_merges(docs, k=2).collect()]
    assert got == [(1, "ab", 3), (2, "AA", 1)]


def test_cleaning_strips_non_letters_and_lowercases(spark):
    docs = _docs(spark, ["A-B a b!", "ab, AB"])
    # cleaned: "abab", "abab" -> 'ab' x4, 'ba' x2
    got = [tuple(r) for r in learn_bpe_merges(docs, k=1).collect()]
    assert got == [(1, "ab", 4)]


def test_greedy_replace_is_left_to_right_nonoverlapping(spark):
    # "aaaa": pairs 'aa' x3 (overlapping COUNT), but replace('aa')
    # applies non-overlapping -> "AA"; next merge is then 'AA'
    docs = _docs(spark, ["aaaa"])
    got = [tuple(r) for r in learn_bpe_merges(docs, k=2).collect()]
    assert got == [(1, "aa", 3), (2, "AA", 1)]


def test_short_docs_do_not_break_pair_explode(spark):
    # 0- and 1-char docs must contribute nothing (Spark sequence(1,0)
    # would run DESCENDING without the length guard)
    docs = _docs(spark, ["", "x", "zz"])
    got = [tuple(r) for r in learn_bpe_merges(docs, k=1).collect()]
    assert got == [(1, "zz", 1)]


def test_apply_matches_training_final_state(spark):
    docs = _docs(spark, ["the cat the bat", "the rat"])
    merges = [r["pair"] for r in learn_bpe_merges(docs, k=3).collect()]
    applied = {r["doc_id"]: r["n_tokens"] for r in apply_bpe_merges(docs, merges).collect()}
    # independently recompute in python with the same greedy rule
    import re

    def clean(t):
        return re.sub("[^a-z]", "", t.lower())

    for i, t in enumerate(["the cat the bat", "the rat"]):
        s = clean(t)
        for j, p in enumerate(merges):
            s = s.replace(p, "ABCDEFGH"[j])
        assert applied[i] == len(s)


def test_exhausted_corpus_returns_fewer_merges(spark):
    docs = _docs(spark, ["a", ""])
    assert learn_bpe_merges(docs, k=3).count() == 0
