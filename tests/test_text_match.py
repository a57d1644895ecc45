"""Aho-Corasick automaton vs brute-force start-position counting,
including overlapping and nested patterns the gate's border-free
blocklist never produces."""

import random

from osm_admin_boundary_conflation_spark.operators.text_match import (
    _scan_counts,
    build_automaton,
)


def _brute(texts, patterns):
    counts = [0] * len(patterns)
    for t in texts:
        for pi, p in enumerate(patterns):
            start = 0
            while True:
                k = t.find(p, start)
                if k < 0:
                    break
                counts[pi] += 1
                start = k + 1  # overlapping occurrences count
    return counts


def test_ac_overlapping_and_nested():
    pats = ("aba", "ab", "ba", "aa", "abab")
    texts = ["ababab", "aaaa", "ba", "", "abba", "ababa"]
    got = _scan_counts(texts, pats).tolist()
    assert got == _brute(texts, pats)


def test_ac_random_corpus():
    rng = random.Random(5)
    alphabet = "abc"
    pats = tuple(
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 5)))
        for _ in range(12)
    )
    pats = tuple(dict.fromkeys(pats))  # dedupe, keep order
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))
        for _ in range(40)
    ]
    got = _scan_counts(texts, pats).tolist()
    assert got == _brute(texts, pats)


def test_ac_no_cross_doc_matches():
    # the NUL separator must prevent a pattern spanning two docs
    pats = ("xy",)
    assert _scan_counts(["zzx", "yzz"], pats).tolist() == [0]


def test_automaton_cached():
    pats = ("foo", "bar")
    t1 = build_automaton(pats)
    t2 = build_automaton(pats)
    assert t1 is t2
