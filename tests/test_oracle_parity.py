"""Committed oracle-parity check for the queries the current driver
window does not verify.

The per-round driver verifies only the FIRST 50 entries of the
``queries()`` dict against their DuckDB oracles, and the window is a
deliberate per-round rotation (see the ROTATION note in
metevents_spark/queries.py): never-driver-seen keys are prioritized
inside the cap, the stalest driver-green cohort is re-confirmed next,
and rows-only keys spend slots only when they have never earned a
driver rows-only row. Everything else needs a committed signal — this
test is it: each oracle-backed query that is either PAST the cap or
in-window but not yet hash-green in any committed CORRECTNESS_r*.json
runs on Spark AND its DuckDB oracle at sf0.001, comparing row count,
columns, and an order-insensitive value hash — the same comparison
tools/check_oracle.py makes. Rows-only ops are pinned by their golden
/ differential tests instead.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracle import TABLES, frame_hash, normalize  # noqa: E402

from tests.conftest import SF_SMALL

DRIVER_CAP = 50


def _entry():
    import __spark_entry__ as entrymod

    return entrymod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


def _driver_hash_green() -> set[str]:
    """Keys with at least one hash-green row in committed driver
    CORRECTNESS history — those in-window keys need no pytest pin."""
    import glob
    import json

    green: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(path) as fh:
            for name, rec in json.load(fh).items():
                if rec.get("hash_match"):
                    green.add(name)
    return green


def past_cap_oracle_queries():
    entrymod = _entry()
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    green = _driver_hash_green()
    # past the cap: always pinned here; in-window: pinned until the
    # driver itself records a hash-green row (new promotions/upgrades)
    return [
        n
        for i, n in enumerate(names)
        if n in oracles and (i >= DRIVER_CAP or n not in green)
    ]


@pytest.mark.parametrize("name", past_cap_oracle_queries())
def test_past_cap_query_matches_oracle(spark, duck, name):
    entrymod = _entry()
    sdf = normalize(entrymod.queries()[name](spark, SF_SMALL).toPandas())
    ddf = normalize(duck.sql(entrymod.oracle_sql()[name]).df())
    assert len(sdf) == len(ddf), f"{name}: rows spark={len(sdf)} duck={len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns), name
    # dtype parity too: DuckDB silently widens SUM-of-int to HUGEINT
    # (-> float64 in pandas), which the value hash forgives but a
    # schema-strict driver would not — oracles must CAST defensively
    s_schema = {c: str(sdf[c].dtype) for c in sdf.columns}
    d_schema = {c: str(ddf[c].dtype) for c in ddf.columns}
    assert s_schema == d_schema, f"{name}: dtype mismatch"
    assert frame_hash(sdf) == frame_hash(ddf), f"{name}: value-hash mismatch"


def test_driver_window_prioritizes_unseen_queries():
    """Rotation policy (round 6): the driver caps CORRECTNESS at 50
    slots, so a slot is wasted when it re-checks an already-green query
    while some registry key has NEVER earned a driver row. Enforce it
    from the committed CORRECTNESS_r*.json history: every never-seen
    key must sit inside the cap (as long as they fit), with the five
    SURVEY §2 reference detectors pinned to slots 1-5."""
    import glob
    import json

    entrymod = _entry()
    names = list(entrymod.queries())
    assert names[:5] == [
        "extreme_value", "flat_line", "extreme_change", "data_gap",
        "freq_infer",
    ]
    seen: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(path) as fh:
            seen |= set(json.load(fh))
    unseen = [n for n in names if n not in seen]
    if len(unseen) <= DRIVER_CAP - 5:
        stranded = [n for n in unseen if n not in names[:DRIVER_CAP]]
        assert not stranded, (
            f"never-driver-checked queries outside the 50-slot window: "
            f"{stranded}"
        )


def test_bench_headline_covers_registry():
    """bench.py's HEADLINE list is the driver-recorded perf surface;
    every registered query must be in it (and nothing stale)."""
    import bench

    entrymod = _entry()
    assert list(bench.HEADLINE) and set(bench.HEADLINE) == set(
        entrymod.queries()
    )
