"""LTTB downsampling: kernel differential vs a literal reference
implementation of Steinarsson's algorithm, invariants, and the
end-to-end Spark path over real testdata."""

from __future__ import annotations

import numpy as np
import pytest

from metevents_spark.operators.downsample import lttb_downsample, lttb_numpy

from tests.conftest import SF_SMALL


def lttb_reference(x: np.ndarray, y: np.ndarray, n_out: int) -> list[int]:
    """Direct transcription of the published algorithm (point-at-a-time,
    no vectorization) for differential checking."""
    n = len(x)
    if n <= n_out:
        return list(range(n))
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    sel = [0]
    a = 0
    for b in range(n_out - 2):
        s, e = edges[b], edges[b + 1]
        if b == n_out - 3:
            ns, ne = n - 1, n
        else:
            ns, ne = edges[b + 1], edges[b + 2]
        cx, cy = x[ns:ne].mean(), y[ns:ne].mean()
        best, best_area = s, -1.0
        for i in range(s, e):
            area = abs((x[a] - cx) * (y[i] - y[a]) - (x[a] - x[i]) * (cy - y[a]))
            if area > best_area:
                best, best_area = i, area
        sel.append(best)
        a = best
    sel.append(n - 1)
    return sel


@pytest.mark.parametrize("n,n_out", [(100, 10), (57, 12), (1000, 50), (20, 3)])
def test_kernel_matches_reference(n, n_out):
    rng = np.random.RandomState(42 + n)
    ts = np.datetime64("2023-01-01", "us") + np.arange(n) * np.timedelta64(
        3600_000_000, "us"
    )
    vals = np.cumsum(rng.randn(n))
    got = lttb_numpy(ts, vals, n_out).tolist()
    x = ts.astype(np.int64).astype(np.float64)
    assert got == lttb_reference(x, vals, n_out)


def test_kernel_invariants():
    n = 500
    rng = np.random.RandomState(7)
    ts = np.datetime64("2023-01-01", "us") + np.cumsum(
        rng.randint(1, 100, n)
    ) * np.timedelta64(60_000_000, "us")
    vals = rng.randn(n)
    keep = lttb_numpy(ts, vals, 40)
    assert len(keep) == 40
    assert keep[0] == 0 and keep[-1] == n - 1      # endpoints survive
    assert np.all(np.diff(keep) > 0)               # sorted, unique


def test_kernel_nan_and_small():
    ts = np.datetime64("2023-01-01", "us") + np.arange(10) * np.timedelta64(
        1, "h"
    ).astype("timedelta64[us]")
    vals = np.arange(10, dtype=float)
    vals[3] = np.nan
    keep = lttb_numpy(ts, vals, 5)
    assert 3 not in keep and len(keep) == 5
    # short series: everything (non-NaN) kept verbatim
    short = lttb_numpy(ts[:3], np.array([1.0, 2.0, 3.0]), 5)
    assert short.tolist() == [0, 1, 2]


def test_spark_end_to_end(spark):
    out = lttb_downsample(spark, SF_SMALL, n_out=15).toPandas()
    assert set(out.columns) == {"sid", "ts", "value"}
    per = out.groupby("sid").size()
    assert (per <= 15).all() and len(per) > 0
    # per-series output is time-sorted with unique timestamps kept
    for _, g in out.groupby("sid"):
        assert g["ts"].is_monotonic_increasing


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=3,
        max_size=200,
    ),
    n_out=st.integers(min_value=3, max_value=50),
)
def test_kernel_fuzz_vs_reference(vals, n_out):
    n = len(vals)
    ts = np.datetime64("2023-01-01", "us") + np.arange(n) * np.timedelta64(
        60_000_000, "us"
    )
    v = np.asarray(vals, dtype=np.float64)
    got = lttb_numpy(ts, v, n_out).tolist()
    x = ts.astype(np.int64).astype(np.float64)
    assert got == lttb_reference(x, v, n_out)
