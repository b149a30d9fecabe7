"""interval_overlap_join: bucketed result must equal the naive
key-equi + inequality join on randomized interval sets — including
intervals much longer than the bucket (multi-bucket spans), zero-width
intervals, and touching endpoints (closed-interval semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from metevents_spark.operators.intervals import interval_overlap_join
from metevents_spark.timeutil import epoch_us


def _intervals(spark, seed: int, n: int, max_len_s: float):
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-03-01")
    start = base + pd.to_timedelta(rng.randint(0, 200_000, size=n), unit="s")
    length = pd.to_timedelta(rng.randint(0, int(max_len_s), size=n), unit="s")
    pdf = pd.DataFrame(
        {
            "sid": rng.choice(["a", "b", "c"], size=n),
            "iid": np.arange(n),
            "start": start,
            "stop": start + length,
        }
    )
    # zero-width intervals pin closed-interval endpoint semantics
    pdf.loc[pdf.index % 9 == 0, "stop"] = pdf.loc[pdf.index % 9 == 0, "start"]
    return spark.createDataFrame(pdf)


def _naive(left, right):
    l = left.select(
        "sid",
        F.col("iid").alias("iid_a"),
        F.col("start").alias("start_a"),
        F.col("stop").alias("stop_a"),
    )
    r = right.select(
        F.col("sid").alias("rsid"),
        F.col("iid").alias("iid_b"),
        F.col("start").alias("start_b"),
        F.col("stop").alias("stop_b"),
    )
    return (
        l.join(r, (l["sid"] == r["rsid"]))
        .filter(
            (F.col("start_a") <= F.col("stop_b"))
            & (F.col("start_b") <= F.col("stop_a"))
        )
        .select(
            "sid", "iid_a", "iid_b",
            (
                epoch_us(F.least("stop_a", "stop_b"))
                - epoch_us(F.greatest("start_a", "start_b"))
            ).alias("overlap_us"),
        )
    )


@pytest.mark.parametrize("bucket_s,max_len_s", [
    (3600.0, 1800.0),     # intervals shorter than the bucket
    (600.0, 7200.0),      # intervals spanning many buckets
])
def test_overlap_join_matches_naive(spark, bucket_s, max_len_s):
    left = _intervals(spark, 1, 120, max_len_s)
    right = _intervals(spark, 2, 90, max_len_s)
    got = (
        interval_overlap_join(
            left.select("sid", "iid", "start", "stop"),
            right.select("sid", "iid", "start", "stop"),
            bucket_s=bucket_s,
        )
        .select("sid", "iid_a", "iid_b", "overlap_us")
        .toPandas()
        .sort_values(["sid", "iid_a", "iid_b"])
        .reset_index(drop=True)
    )
    want = (
        _naive(left, right)
        .toPandas()
        .sort_values(["sid", "iid_a", "iid_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # each overlapping pair appears exactly once (claim dedup, no distinct)
    assert not got.duplicated(["sid", "iid_a", "iid_b"]).any()
    assert (got["overlap_us"] >= 0).all()


def test_overlap_join_plan_has_no_cartesian(spark):
    left = _intervals(spark, 3, 40, 3600.0)
    right = _intervals(spark, 4, 40, 3600.0)
    plan = interval_overlap_join(
        left.select("sid", "iid", "start", "stop"),
        right.select("sid", "iid", "start", "stop"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_overlap_join_property_fuzz(spark):
    """Hypothesis-style fuzz without per-example Spark jobs: many random
    interval regimes packed into one frame pair, compared to the naive
    join, across bucket sizes that straddle the interval lengths."""
    import itertools

    for seed, bucket_s in itertools.product([11, 29, 47], [120.0, 3600.0, 86400.0]):
        left = _intervals(spark, seed, 80, 5000.0)
        right = _intervals(spark, seed + 1000, 60, 5000.0)
        got = (
            interval_overlap_join(
                left.select("sid", "iid", "start", "stop"),
                right.select("sid", "iid", "start", "stop"),
                bucket_s=bucket_s,
            )
            .select("sid", "iid_a", "iid_b", "overlap_us")
            .toPandas()
            .sort_values(["sid", "iid_a", "iid_b"])
            .reset_index(drop=True)
        )
        want = (
            _naive(left, right)
            .toPandas()
            .sort_values(["sid", "iid_a", "iid_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False), (seed, bucket_s)
