"""Storm-merge kernel tests — the reference's parametrized cases
(/root/reference/tests/test_events.py:26-79) reproduced exactly."""

from __future__ import annotations

import pytest

from metevents_spark.operators import storm_find
from tests.conftest import make_series_df

DAY_US = 86_400_000_000


@pytest.mark.parametrize(
    "data, start_mass, stop_hours, total_mass, max_hours, n_storms",
    [
        ([0, 1, 1, 0, 0, 1, 1], 0.1, 24, 1, 300, 2),
        ([0, 0.1, 0.1, 0, 0.1, 0.1], 0.1, 48, 0.1, 300, 1),
        ([0.1, 0, 0.1, 0.1], 0.1, 24, 0.2, 300, 1),
        ([0, 0.1, 0, 0.1, 0.1, 0], 0.1, 24, 0.1, 24, 2),
    ],
)
def test_storm_counts(spark, data, start_mass, stop_hours, total_mass,
                      max_hours, n_storms):
    df = make_series_df(spark, [float(x) for x in data])
    ev = storm_find(
        df,
        instant_mass_to_start=start_mass,
        hours_to_stop=stop_hours,
        min_storm_total=total_mass,
        max_storm_hours=max_hours,
    ).collect()
    assert len(ev) == n_storms


@pytest.mark.parametrize(
    "data, mass, hours, totals",
    [
        ([0, 1, 1, 0, 0, 1, 1], 0.1, 24, [2, 2]),
        ([0, 1, 1, 0, 0, 1, 1], 0.1, 72, [4]),
    ],
)
def test_storm_totals(spark, data, mass, hours, totals):
    df = make_series_df(spark, [float(x) for x in data])
    ev = storm_find(df, instant_mass_to_start=mass, hours_to_stop=hours).collect()
    assert [r.total for r in ev] == totals


@pytest.mark.parametrize(
    "data, mass, hours, durations",
    [
        ([0, 1, 1, 0, 0, 1, 1], 0.1, 24, [2, 2]),
        ([0.2, 1, 0, 1, 0.2, 1], 0.1, 24, [1, 3]),
        ([1, 1, 1, 1], 0.1, 24, [3]),
    ],
)
def test_storm_durations(spark, data, mass, hours, durations):
    df = make_series_df(spark, [float(x) for x in data])
    ev = storm_find(df, instant_mass_to_start=mass, hours_to_stop=hours).collect()
    assert [r.duration_us for r in ev] == [t * DAY_US for t in durations]


def test_many_series_parallel(spark):
    """Independent series must not interfere (the distributed path)."""
    df1 = make_series_df(spark, [0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0], sid="a")
    df2 = make_series_df(spark, [0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0], sid="b")
    ev = storm_find(df1.unionByName(df2), instant_mass_to_start=0.1,
                    hours_to_stop=24).collect()
    assert len(ev) == 4
    assert sorted({r.sid for r in ev}) == ["a", "b"]
