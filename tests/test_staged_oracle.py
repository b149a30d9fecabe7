"""Driver-style oracle parity for the STAGED round-7 queries
(metevents_spark.staged) — same rowcount/columns/value-hash comparison
the driver and tests/test_oracle_parity.py use, so registration next
round is a pre-validated dict merge."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracle import TABLES, frame_hash, normalize  # noqa: E402

from metevents_spark.staged import STAGED_ORACLE_SQL, STAGED_QUERIES
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


def test_every_staged_query_has_an_oracle():
    assert set(STAGED_QUERIES) == set(STAGED_ORACLE_SQL)


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = normalize(STAGED_QUERIES[name](spark, SF_SMALL).toPandas())
    ddf = normalize(duck.sql(STAGED_ORACLE_SQL[name]).df())
    assert len(sdf) == len(ddf), f"{name}: rows spark={len(sdf)} duck={len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns), name
    assert frame_hash(sdf) == frame_hash(ddf), f"{name}: value-hash mismatch"
