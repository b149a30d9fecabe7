"""Round-12 hardening: exact wide-integer folds where int64
intermediates wrap (the r12 ADVICE items) — the bucketed Mann-Whitney
ties³ term past the 2,097,151-samples-per-bucket long bound.

(The k-means score-arithmetic counterpart lives in
tests/test_semdedup.py::test_int_scores_exact_at_wrap_scale.)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_fat_bucket_events(tmp_path, n_view=2_200_000, n_click=100):
    """Baseline 'view' concentrates every sample onto ONE value (one
    histogram bucket of >2.09M samples — t*t*t no longer fits in an
    int64); 'click' spreads over [1, 2] so the global range is real."""
    click_vals = 1.0 + np.arange(n_click, dtype="float64") / (n_click - 1)
    n = n_view + n_click
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(
                np.full(n, np.datetime64("2024-01-01", "us"))
            ),
            "user_id": np.ones(n, dtype="int64"),
            "event_type": ["view"] * n_view + ["click"] * n_click,
            "value": np.concatenate(
                [np.ones(n_view, dtype="float64"), click_vals]
            ),
        }
    )
    t = pa.Table.from_pandas(df)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return click_vals


def _expected_bucketed_z(view_vals, click_vals, n_buckets=256):
    """Independent replication of the bucketed statistic with
    arbitrary-precision Python ints (the value HUGEINT/decimal(38,0)
    folds produce)."""
    allv = np.concatenate([view_vals, click_vals])
    vmin, vmax = float(allv.min()), float(allv.max())

    def bkt(v):
        return min(n_buckets - 1, math.floor((v - vmin) / (vmax - vmin) * n_buckets))

    cells = {}
    for v in view_vals:
        b = bkt(v)
        na, t = cells.get(b, (0, 0))
        cells[b] = (na, t + 1)
    for v in click_vals:
        b = bkt(v)
        na, t = cells.get(b, (0, 0))
        cells[b] = (na + 1, t + 1)
    n_a = sum(na for na, _ in cells.values())
    n_b = sum(t - na for na, t in cells.values())
    r_a, ties3, cum = 0.0, 0, 0
    for b in sorted(cells):
        na, t = cells[b]
        midrank = float(cum) + (t + 1) / 2.0
        r_a += na * midrank
        ties3 += t**3 - t  # Python int: exact past the int64 bound
        cum += t
    n = n_a + n_b
    u_a = r_a - n_a * (n_a + 1) / 2.0
    mu = n_a * n_b / 2.0
    sigma = math.sqrt(
        n_a * n_b / 12.0 * ((n + 1) - float(ties3) / (n * (n - 1)))
    )
    return n_a, n_b, u_a, round((u_a - mu) / sigma, 6)


def test_mann_whitney_bucketed_exact_past_int64_tie_bound(spark, tmp_path):
    """2.2M identical baseline samples put one bucket's t*t*t at
    ~1.06e19 > 2**63-1: a long fold wraps ties3 negative and inflates
    sigma silently. The decimal(38,0) fold must reproduce the
    arbitrary-precision z bit-for-bit (after the shared ROUND(.,6))."""
    from metevents_spark.operators.rankstats import mann_whitney_u_bucketed

    click_vals = _write_fat_bucket_events(tmp_path)
    got = mann_whitney_u_bucketed(spark, str(tmp_path)).collect()
    assert len(got) == 1
    row = got[0]
    n_a, n_b, u_a, z = _expected_bucketed_z(
        np.ones(2_200_000, dtype="float64"), click_vals
    )
    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    assert abs(row["u_a"] - u_a) < 1e-6
    assert row["z"] == z, (row["z"], z)
