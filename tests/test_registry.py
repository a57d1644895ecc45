"""Registry contract invariants (no Spark session needed): the driver
samples the FIRST 50 rotated entries and runs every oracle in DuckDB —
breakage here is a silent red gate, so pin the contract in pytest."""

import duckdb

from osm_admin_boundary_conflation_spark.queries import (
    ORACLES,
    QUERIES,
    _DRIVER_HEAD,
    _rotated,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle_and_vice_versa():
    assert set(ORACLES) <= set(QUERIES)
    missing = set(QUERIES) - set(ORACLES)
    # every registered query is oracle-paired in this repo (none rely
    # on the weaker rows-only check)
    assert not missing, f"queries without oracle SQL: {sorted(missing)}"


def test_driver_head_is_exactly_the_50_row_sample():
    assert len(_DRIVER_HEAD) == 50
    assert len(set(_DRIVER_HEAD)) == 50, "duplicate names in head"
    unknown = [n for n in _DRIVER_HEAD if n not in QUERIES]
    assert not unknown, f"head names not registered: {unknown}"
    rotated = list(_rotated(QUERIES))
    assert rotated[:50] == _DRIVER_HEAD
    assert rotated[0] == "geotag"  # entry() flagship stays first
    # rotation must only reorder, never drop or invent
    assert set(rotated) == set(QUERIES)
    assert list(_rotated(ORACLES)) and set(_rotated(ORACLES)) == set(ORACLES)


def test_all_oracle_sql_parses_and_plans_in_duckdb():
    """EXPLAIN every oracle against the real testdata views: catches
    syntax errors, missing columns, and type errors WITHOUT paying
    execution — the cheap half of what driver_sim proves."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    bad = []
    for name, sql in ORACLES.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, f"oracles failing to plan: {bad}"
