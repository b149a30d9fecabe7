"""Storm-merge kernel tests — the reference's parametrized cases
(/root/reference/tests/test_events.py:26-79) reproduced exactly."""

from __future__ import annotations

import pandas as pd
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


@pytest.mark.parametrize(
    "step_hours, ext_points",
    [
        (24, 1),  # daily: tstep 1 day -> extension reaches ts[1]
        (1, 1),   # hourly: tstep 1 hour -> extension reaches ts[1]
        # 6-hourly pins the reference's resolution quirk: tstep comes
        # from to_offset(delta.resolution_string) (events.py:76-77 +
        # utilities.py:14) = ONE hour, not the actual 6-hour delta, so
        # the close-time start extension reaches back 1h — where no
        # sample exists — and the event does NOT absorb ts[1].
        (6, 0),
    ],
)
def test_storm_default_tstep_wiring(spark, step_hours, ext_points):
    """determine_freq default wiring through StormEvents.find() with no
    explicit tstep (reference events.py:76-79)."""
    from datetime import datetime, timedelta

    from metevents_spark.api import StormEvents

    start = datetime(2023, 1, 1)
    vals = [0.0, 0.0, 5.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 5.0, 5.0]
    rows = [
        ("s1", i, start + timedelta(hours=i * step_hours), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "sid string, seq long, ts timestamp, value double"
    )
    se = StormEvents(df, spark=spark)
    se.find(instant_mass_to_start=1.0, min_storm_total=1.0, hours_to_stop=5)
    ev = sorted(se.events, key=lambda p: p.start)
    assert se.N == 2
    step = timedelta(hours=step_hours)
    # first storm: burst at idx 2-3; extension pulls in idx 1 only when
    # a sample exists one TSTEP before the burst start
    exp_start = start + (2 - ext_points) * step
    assert ev[0].start == pd.Timestamp(exp_start)
    assert ev[0].stop == pd.Timestamp(start + 3 * step)
    assert ev[0].total == 10.0
    # last-burst flush gets the same extension treatment
    exp_start2 = start + (10 - ext_points) * step
    assert ev[1].start == pd.Timestamp(exp_start2)


def test_storm_irregular_series_fallback(spark):
    """Irregular cadence: the reference fails outright (determine_freq
    returns None and to_offset(None) cannot build a timestep) — our
    documented divergence falls back to the median positive delta so
    irregular event streams still work."""
    from datetime import datetime, timedelta

    from metevents_spark.api import StormEvents

    start = datetime(2023, 1, 1)
    offsets = [0, 1, 3, 4, 9, 11, 14, 20, 21, 22]  # hours, irregular
    vals = [0.0, 5.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 5.0, 5.0]
    rows = [
        ("s1", i, start + timedelta(hours=h), v)
        for i, (h, v) in enumerate(zip(offsets, vals))
    ]
    df = spark.createDataFrame(
        rows, "sid string, seq long, ts timestamp, value double"
    )
    se = StormEvents(df, spark=spark)
    se.find(instant_mass_to_start=1.0, min_storm_total=1.0, hours_to_stop=4)
    assert se.N == 2
    assert all(p.total == 10.0 for p in se.events)
