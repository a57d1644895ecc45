"""Bloom filter operator (operators/bloom.py): zero false negatives by
construction, deterministic false positives, compact build."""

import pyspark.sql.functions as F

from osm_admin_boundary_conflation_spark.operators.bloom import (
    GOLDEN,
    bloom_build,
    bloom_flag,
    bloom_prune,
)


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "key bigint")


def test_no_false_negatives_and_deterministic_fps(spark):
    dim_keys = list(range(0, 200, 7))
    dim = _keys(spark, dim_keys)
    probe = _keys(spark, range(200))
    bits = bloom_build(dim, "key", m=512, k=3)
    flags = {
        r["key"]: r["pass_bloom"]
        for r in bloom_flag(probe, "key", bits, m=512, k=3).collect()
    }
    # every member passes — a bloom filter can NEVER false-negative
    assert all(flags[k] for k in dim_keys)
    # false positives exist at this density but are a fixed set: an
    # independent python replay of the same hash family must agree
    import hashlib

    set_bits = set()
    for k in dim_keys:
        h = int(hashlib.md5(f"0:{k}".encode()).hexdigest()[:15], 16)
        for i in range(3):
            set_bits.add((h * (2 * i + 1) + i * GOLDEN) % 512)
    for k in range(200):
        h = int(hashlib.md5(f"0:{k}".encode()).hexdigest()[:15], 16)
        expect = all(((h * (2 * i + 1) + i * GOLDEN) % 512) in set_bits for i in range(3))
        assert flags[k] == expect, k


def test_prune_is_superset_of_semi_join(spark):
    dim = _keys(spark, [3, 5, 8, 13])
    probe = _keys(spark, range(50))
    bits = bloom_build(dim, "key", m=64, k=2)  # tiny m -> plenty of FPs
    kept = {r["key"] for r in bloom_prune(probe, "key", bits, m=64, k=2).collect()}
    assert {3, 5, 8, 13} <= kept <= set(range(50))


def test_build_is_single_sorted_row(spark):
    dim = _keys(spark, range(100))
    rows = bloom_build(dim, "key", m=256, k=3).collect()
    assert len(rows) == 1
    bits = rows[0]["bits"]
    assert bits == sorted(set(bits))
    assert all(0 <= b < 256 for b in bits)


def test_pick_semi_strategy_thresholds():
    from osm_admin_boundary_conflation_spark.operators.bloom import (
        BLOOM_MAX_KEYS,
        BROADCAST_MAX_KEYS,
        pick_semi_strategy,
    )

    assert pick_semi_strategy(0) == "broadcast"
    assert pick_semi_strategy(BROADCAST_MAX_KEYS) == "broadcast"
    assert pick_semi_strategy(BROADCAST_MAX_KEYS + 1) == "bloom"
    assert pick_semi_strategy(BLOOM_MAX_KEYS) == "bloom"
    assert pick_semi_strategy(BLOOM_MAX_KEYS + 1) == "shuffle"
