"""The correctness gate's own guards: value/row/column mismatches must
be caught by the normalization compare, and the lossy-type sweep must
flag HUGEINT/DECIMAL oracle outputs (the r02 events_sessionize class
of silent float degradation)."""

import importlib.util
import os
import sys

import duckdb

_spec = importlib.util.spec_from_file_location(
    "driver_sim",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "driver_sim.py"),
)
driver_sim = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(driver_sim)


def test_norm_rows_catches_value_diff():
    cols = ["a", "b"]
    sc, sr = driver_sim.norm_rows(cols, [(1, 2.0), (3, 4.0)])
    dc, dr = driver_sim.norm_rows(cols, [(1, 2.0), (3, 4.5)])
    assert sc == dc and sr != dr


def test_norm_rows_column_order_insensitive():
    sc, sr = driver_sim.norm_rows(["b", "a"], [(2.0, 1)])
    dc, dr = driver_sim.norm_rows(["a", "b"], [(1, 2.0)])
    assert sc == dc and sr == dr


def test_norm_rows_row_order_insensitive():
    sc, sr = driver_sim.norm_rows(["a"], [(2,), (1,)])
    dc, dr = driver_sim.norm_rows(["a"], [(1,), (2,)])
    assert sr == dr


def test_float_formatting_distinguishes_int_vs_float_degradation():
    # '7' (exact int) vs 7.0 (float64 degradation) must MISMATCH —
    # that is the whole point of the lossy-type sweep
    assert driver_sim.norm_cell(7) != driver_sim.norm_cell(7.0000001)
    # but a true float compares through the 9-sig-digit normalization
    assert driver_sim.norm_cell(0.1 + 0.2) == driver_sim.norm_cell(0.3)


def test_lossy_type_sweep_flags_hugeint():
    con = duckdb.connect()
    rel = con.sql("SELECT sum(x) AS s FROM (SELECT unnest(range(5)) AS x)")
    lossy = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
    ]
    assert lossy, "sum(int) should surface as HUGEINT and be flagged"
    rel2 = con.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT unnest(range(5)) AS x)"
    )
    lossy2 = [
        (c, str(t))
        for c, t in zip(rel2.columns, rel2.types)
        if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
    ]
    assert not lossy2
