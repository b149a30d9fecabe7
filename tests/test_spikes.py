"""Spike/valley golden test against the reference's flv.csv fixture —
exactly 11 events with known starts/stops/durations
(/root/reference/tests/test_events.py:118-176). The fixture CSV is read
from the read-only reference checkout; skipped if absent."""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pytest

from metevents_spark.operators import spike_valley

FLV = Path("/root/reference/tests/data/mocks/flv.csv")

EXPECTED = [
    ("2022-11-01", "2022-11-04", 3),
    ("2022-11-11", "2022-11-14", 3),
    ("2022-11-30", "2022-12-14", 14),
    ("2022-12-29", "2023-01-02", 4),
    ("2023-01-04", "2023-01-07", 3),
    ("2023-01-15", "2023-01-20", 5),
    ("2023-01-28", "2023-01-31", 3),
    ("2023-02-04", "2023-02-07", 3),
    ("2023-02-12", "2023-02-17", 5),
    ("2023-02-19", "2023-03-05", 14),
    ("2023-04-23", "2023-04-26", 3),
]

DAY_US = 86_400_000_000


@pytest.mark.skipif(not FLV.exists(), reason="reference fixture unavailable")
def test_flv_golden(spark):
    pdf = pd.read_csv(FLV, parse_dates=["datetime"])
    pdf["ts"] = pdf["datetime"].dt.tz_convert("UTC").dt.tz_localize(None)
    rows = [
        ("FLV", i, row.ts.to_pydatetime(), float(row.SNOWDEPTH))
        for i, row in enumerate(pdf.itertuples())
    ]
    df = spark.createDataFrame(
        rows, schema="sid string, seq long, ts timestamp, value double"
    )
    ev = spike_valley(df).collect()  # defaults prominence=100, width=(0,3)
    assert len(ev) == 11
    for r, (start, stop, dur) in zip(ev, EXPECTED):
        assert r.start.strftime("%Y-%m-%d") == start
        assert r.stop.strftime("%Y-%m-%d") == stop
        assert r.duration_us == dur * DAY_US


def test_simple_spike(spark):
    """A step spike in a ramp — mirrors the extreme-change fixture
    (/root/reference/tests/test_events.py:352-359) shape."""
    import numpy as np
    from tests.conftest import make_series_df

    data = np.arange(100, dtype=float)
    data[50] = 500.0
    df = make_series_df(spark, data.tolist())
    ev = spike_valley(df, prominence=100.0).collect()
    assert len(ev) == 1
    assert ev[0].n_points >= 1
