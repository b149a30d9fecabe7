"""MetloomBackend exercised against a mocked metloom package.

The live-network branch of the station connector
(sources/station.py MetloomBackend, mirroring reference
metevents/events.py:123-165) cannot run in this sandbox, so a fake
``metloom.pointdata`` module is injected to drive the real dispatch
table, the empty-result ValueError, and the accumulated->incremental
lag diff on the code path a live fetch would take.
"""

from __future__ import annotations

import sys
import types

import pandas as pd
import pytest

from metevents_spark.sources.station import (
    MetloomBackend,
    fetch_station_series,
)


class _FakeVar:
    name = "PRECIPITATIONACCUM"


class _FakeVars:
    PRECIPITATIONACCUM = _FakeVar()


CALLS: list[tuple] = []

ACCUM = [0.0, 1.0, 3.0, 3.0, 7.0]


class _BasePoint:
    ALLOWED_VARIABLES = _FakeVars()

    def __init__(self, station_id, name):
        self.station_id = station_id
        self.name = name

    def get_daily_data(self, start, stop, variables):
        CALLS.append(
            (type(self).__name__, self.station_id, [v.name for v in variables])
        )
        if self.station_id == "EMPTY":
            return None
        # metloom indexes daily frames by (datetime, site)
        idx = pd.MultiIndex.from_product(
            [
                pd.date_range(start, periods=len(ACCUM), freq="D"),
                [self.name],
            ],
            names=["datetime", "site"],
        )
        return pd.DataFrame({"PRECIPITATIONACCUM": ACCUM}, index=idx)


class SnotelPointData(_BasePoint):
    pass


class CDECPointData(_BasePoint):
    pass


class MesowestPointData(_BasePoint):
    pass


@pytest.fixture()
def fake_metloom(monkeypatch):
    pointdata = types.ModuleType("metloom.pointdata")
    pointdata.SnotelPointData = SnotelPointData
    pointdata.CDECPointData = CDECPointData
    pointdata.MesowestPointData = MesowestPointData
    metloom = types.ModuleType("metloom")
    metloom.pointdata = pointdata
    monkeypatch.setitem(sys.modules, "metloom", metloom)
    monkeypatch.setitem(sys.modules, "metloom.pointdata", pointdata)
    CALLS.clear()
    yield


def test_metloom_dispatch_and_lag_diff(spark, fake_metloom):
    """source -> metloom class dispatch (reference events.py:139-143)
    and the accumulated->incremental diff (events.py:165) on the
    default (metloom) backend path."""
    out = fetch_station_series(
        "FLV", "2023-01-01", "2023-01-05", source="CDEC", spark=spark
    ).orderBy("seq")
    rows = out.collect()
    assert CALLS == [("CDECPointData", "FLV", ["PRECIPITATIONACCUM"])]
    # .diff(): first point NULL, then increments of the accumulated curve
    got = [r.value for r in rows]
    assert got[0] is None
    assert got[1:] == [
        ACCUM[i] - ACCUM[i - 1] for i in range(1, len(ACCUM))
    ]
    assert all(r.sid == "FLV" for r in rows)


def test_metloom_source_dispatch_per_class(spark, fake_metloom):
    for source, cls_name in [
        ("NRCS", "SnotelPointData"),
        ("Mesowest", "MesowestPointData"),
    ]:
        CALLS.clear()
        fetch_station_series(
            "S1", "2023-01-01", "2023-01-05", source=source, spark=spark
        ).collect()
        assert CALLS[0][0] == cls_name


def test_metloom_empty_result_raises(spark, fake_metloom):
    """Empty fetch -> ValueError with the reference's message shape
    (events.py:156-161)."""
    with pytest.raises(ValueError, match="produced no data"):
        fetch_station_series(
            "EMPTY", "2023-01-01", "2023-01-05", source="NRCS", spark=spark
        )


def test_metloom_backend_import_error_without_fake(spark, monkeypatch):
    """Without metloom installed the backend raises a descriptive
    ImportError instead of crashing on first use."""
    monkeypatch.delitem(sys.modules, "metloom", raising=False)
    monkeypatch.delitem(sys.modules, "metloom.pointdata", raising=False)
    with pytest.raises(ImportError, match="metloom is not installed"):
        MetloomBackend().fetch("X", "2023-01-01", "2023-01-02", "n", "NRCS")
