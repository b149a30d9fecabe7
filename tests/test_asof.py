"""Differential: asof_join vs pandas merge_asof across directions and
tolerances (the reference's pandas dependency defines the semantics).
The registry query asof_purchase_before_error covers the backward
direction against a DuckDB ASOF JOIN; this covers the full surface on
randomized data, including same-instant ties and null value columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from metevents_spark.operators.asof import asof_join


def _frames(seed: int, with_nulls: bool = False):
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-01")

    def mk(n, keys):
        ts = base + pd.to_timedelta(
            rng.randint(0, 10_000, size=n), unit="s"
        )
        df = pd.DataFrame(
            {
                "sid": rng.choice(keys, size=n),
                "ts": ts,
                "value": rng.randn(n).round(3),
            }
        )
        return df.sort_values(["ts", "sid"]).reset_index(drop=True)

    left = mk(200, ["a", "b", "c"])
    right = mk(150, ["a", "b", "d"])
    # force same-instant collisions to pin tie semantics
    right.loc[:10, ["sid", "ts"]] = left.loc[:10, ["sid", "ts"]].values
    if with_nulls:
        right.loc[right.index % 7 == 0, "value"] = np.nan
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol", [None, 600.0])
def test_asof_matches_pandas(spark, direction, tol):
    left, right = _frames(42)
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got = (
        asof_join(
            sl, sr, on="sid", value_cols=("value",),
            direction=direction, tolerance_s=tol,
        )
        .toPandas()
        .sort_values(["sid", "ts", "value"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(
            columns={"value": "value_right", "ts": "ts_right"}
        ),
        left_on="ts",
        right_on="ts_right",
        by="sid",
        direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        allow_exact_matches=True,
    ).sort_values(["sid", "ts", "value"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["value_right"], want["value_right"], check_names=False
    )
    pd.testing.assert_series_equal(
        got["ts_right"], want["ts_right"], check_names=False
    )


def test_asof_null_value_does_not_mix_rows(spark):
    """A right row with a NULL value must still be the match (its
    NULL travels with its timestamp) — not be skipped in favor of an
    older row's value."""
    left, right = _frames(7, with_nulls=True)
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got = (
        asof_join(sl, sr, on="sid", value_cols=("value",))
        .toPandas()
        .sort_values(["sid", "ts", "value"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(
            columns={"value": "value_right", "ts": "ts_right"}
        ),
        left_on="ts", right_on="ts_right", by="sid", direction="backward",
    ).sort_values(["sid", "ts", "value"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["value_right"], want["value_right"], check_names=False
    )
    pd.testing.assert_series_equal(
        got["ts_right"], want["ts_right"], check_names=False
    )
