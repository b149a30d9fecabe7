"""Differential test of the streaming sorted-partition kernel
(operators/grouped.py): distributed results must equal a driver-side
per-series run of the identical numpy kernel, including when Arrow
batches are forced tiny so series straddle batch boundaries."""

from __future__ import annotations

import numpy as np
import pytest

from metevents_spark.io import series_frame
from metevents_spark.operators import storm_find
from metevents_spark.operators.storms import storm_find_numpy

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tiny_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def _driver_side_events(spark):
    pdf = (
        series_frame(spark, SF)
        .orderBy("sid", "ts", "seq")
        .toPandas()
    )
    expected = []
    for sid, g in pdf.groupby("sid", sort=True):
        ts = g["ts"].to_numpy(dtype="datetime64[us]")
        vals = g["value"].to_numpy(dtype=np.float64)
        for e in storm_find_numpy(
            ts, vals, instant_mass_to_start=100.0, min_storm_total=500.0,
            hours_to_stop=24,
        ):
            expected.append((sid, e[0], e[1], e[2], e[3]))
    expected.sort()
    return expected


def test_storm_matches_driver_side(spark, tiny_batches):
    got = [
        (
            r.sid,
            np.datetime64(r.start, "us"),
            np.datetime64(r.stop, "us"),
            r.total,
            r.n_points,
        )
        for r in storm_find(
            series_frame(spark, SF),
            instant_mass_to_start=100.0,
            min_storm_total=500.0,
            hours_to_stop=24,
        ).collect()
    ]
    got.sort()
    expected = _driver_side_events(spark)
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[:3] == e[:3]
        assert g[4] == e[4]
        assert abs(g[3] - e[3]) < 1e-9
