from __future__ import annotations

import os
from datetime import datetime, timedelta

import pandas as pd
import pytest

# Before any session exists: registry queries re-apply
# SPARK_GRAFT_SHUFFLE via tune_session on EVERY entry (queries.py
# _releasing), so without this the library default (32) silently
# overrides the fixture's 4 and every registry-driven test runs 8x
# too many tiny tasks on local[4] — pure scheduler overhead at
# sf0.001 (~25% of test_oracle_parity's wall time).
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")

# pytest.ini points basetemp at tmpfs (/dev/shm) for the streaming
# checkpoints; make sure the directory exists on hosts where /dev/shm
# was cleared between sessions
os.makedirs("/dev/shm/pytest-metevents", exist_ok=True)

from metevents_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="metevents-spark-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s


def make_series_df(spark, data, start=datetime(2023, 1, 1), freq_days=1,
                   sid="s1"):
    """Daily series like the reference test fixture
    (/root/reference/tests/test_events.py:15-18)."""
    rows = []
    for i, v in enumerate(data):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            val = None
        else:
            val = float(v)
        rows.append((sid, i, start + timedelta(days=i * freq_days), val))
    return spark.createDataFrame(
        rows, schema="sid string, seq long, ts timestamp, value double"
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "bigscale: 10x endurance check — builds an sf1-equivalent "
        "dataset in /tmp and hash-checks the heaviest oracle queries "
        "(opt-in: pytest -m bigscale)",
    )
    config.addinivalue_line(
        "markers",
        "slowfuzz: heaviest hypothesis property suites (many Spark "
        "jobs per example); invariants already spot-pinned by the "
        "deterministic dedup tests (opt-in: pytest -m slowfuzz)",
    )


def pytest_collection_modifyitems(config, items):
    # bigscale / slowfuzz are opt-in: skipped unless -m names them
    expr = config.getoption("-m") or ""
    for marker in ("bigscale", "slowfuzz"):
        if marker in expr:
            continue
        skip = pytest.mark.skip(
            reason=f"opt-in: run with `pytest -m {marker}`"
        )
        for item in items:
            if marker in item.keywords:
                item.add_marker(skip)
