"""Focused pins for the r13 two-scan-sweep rewrites.

Each rewrite in the sweep replaced a two-scan shape (set op, grouped
agg + join-back, re-derived day list) with a single-pass shape whose
edge semantics — null join keys dropped by the old INNER joins,
exceptAll's bag semantics, phantom trailing window days — are easy to
get subtly wrong and are NOT exercised by the synthetic registry data
(no null user_ids/texts below sf0.1). These tests construct the edge
cases explicitly and compare the shipped functions against the literal
old formulations on the same data.
"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


# ---------------------------------------------------------------- set ops


def _write_orders(spark, tmp_path):
    rows = [
        # cust 1: 3x1995 + 1x1996 -> exceptAll keeps 2 copies -> churned;
        # also in both years -> repeat
        (1, datetime(1995, 3, 1)),
        (1, datetime(1995, 4, 1)),
        (1, datetime(1995, 5, 1)),
        (1, datetime(1996, 6, 1)),
        # cust 2: 1x1995 + 2x1996 -> NOT churned (bag diff empty); repeat
        (2, datetime(1995, 1, 2)),
        (2, datetime(1996, 2, 2)),
        (2, datetime(1996, 3, 2)),
        # cust 3: 1995 only -> churned, not repeat
        (3, datetime(1995, 7, 3)),
        # cust 4: 1996 only -> neither
        (4, datetime(1996, 8, 4)),
        # cust 5: equal counts both years -> repeat, not churned
        (5, datetime(1995, 9, 5)),
        (5, datetime(1996, 9, 5)),
        # NULL custkey in both years: INTERSECT's null-safe equality
        # KEEPS it; EXCEPT ALL matches null-safe too (2x95 vs 1x96 -> 1
        # copy survives -> churned)
        (None, datetime(1995, 10, 6)),
        (None, datetime(1995, 11, 6)),
        (None, datetime(1996, 10, 6)),
        # cust 7: outside both years entirely -> invisible
        (7, datetime(1994, 1, 7)),
    ]
    df = spark.createDataFrame(
        rows, schema="o_custkey long, o_orderdate timestamp"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    return df


def _old_keys(orders, year):
    return orders.filter(F.year("o_orderdate") == year).select(
        F.col("o_custkey").alias("custkey")
    )


def test_repeat_customers_matches_literal_intersect(spark, tmp_path):
    from metevents_spark.relational.tpch import repeat_customers

    orders = _write_orders(spark, tmp_path)
    got = _rows(repeat_customers(spark, str(tmp_path)))
    want = _rows(
        _old_keys(orders, 1995).intersect(_old_keys(orders, 1996))
    )
    assert got == want
    # the null-safe edge is actually present in the expectation
    assert (None,) in want and (1,) in want and (3,) not in want


def test_churned_customers_matches_literal_exceptall(spark, tmp_path):
    from metevents_spark.relational.tpch import churned_customers

    orders = _write_orders(spark, tmp_path)
    got = _rows(churned_customers(spark, str(tmp_path)))
    want = _rows(
        _old_keys(orders, 1995)
        .exceptAll(_old_keys(orders, 1996))
        .distinct()
    )
    assert got == want
    # bag semantics: cust 1 (3 vs 1) churned, cust 2 (1 vs 2) not,
    # cust 5 (1 vs 1) not, NULL (2 vs 1) churned
    assert (1,) in want and (2,) not in want
    assert (5,) not in want and (None,) in want


# ------------------------------------------- null keys through the windows


def test_series_quantile_bands_drops_null_sid_like_the_old_join(
    spark, tmp_path
):
    from metevents_spark.operators.seriesstats import series_quantile_bands

    rows = [
        (1, 1, datetime(2024, 1, 1, h), float(h)) for h in range(1, 9)
    ] + [
        # a NULL user_id: the old inner join on sid dropped it; the
        # window rewrite must filter it explicitly
        (None, 9, datetime(2024, 1, 2), 1000.0),
        # a NULL / NaN value: excluded by the value filter in both
        (1, 10, datetime(2024, 1, 3), None),
        (1, 11, datetime(2024, 1, 4), float("nan")),
    ]
    spark.createDataFrame(
        rows, schema="user_id long, event_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = series_quantile_bands(spark, str(tmp_path)).collect()
    assert [r.sid for r in out] == ["1"]
    assert out[0].n == 8  # null sid and null/NaN values contribute nothing
    assert out[0].p50 == 4.5  # exact interpolated median of 1..8


def test_retention_cohorts_drops_null_user_like_the_old_join(
    spark, tmp_path
):
    from metevents_spark.relational.product import retention_cohorts

    rows = [
        (1, datetime(2024, 1, 1)),   # cohort week 0
        (1, datetime(2024, 1, 10)),  # week 1
        (2, datetime(2024, 1, 2)),   # cohort week 0, week 0 only
        (None, datetime(2024, 1, 1)),
        (None, datetime(2024, 1, 10)),
    ]
    spark.createDataFrame(
        rows, schema="user_id long, ts timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {(r.cohort_week, r.week_no): r.n_active
           for r in retention_cohorts(spark, str(tmp_path)).collect()}
    w0 = datetime(2024, 1, 1)  # Monday, both users' cohort week
    # null users would have added phantom groups / inflated nothing:
    # countDistinct ignores nulls but the old join removed the ROWS
    assert out == {(w0, 0): 2, (w0, 1): 1}


def test_dedup_rate_by_source_drops_null_text_like_the_old_join(
    spark, tmp_path
):
    from metevents_spark.text.dedup import dedup_rate_by_source

    rows = [
        (1, "a", "same opening text"),
        (2, "a", "same opening text"),
        (3, "a", "unique text one"),
        (4, "b", "same opening text"),
        (5, "b", None),  # NULL text -> NULL digest -> dropped entirely
    ]
    spark.createDataFrame(
        rows, schema="doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: (r.n_docs, r.n_dup)
           for r in dedup_rate_by_source(spark, str(tmp_path)).collect()}
    # old shape: groupBy(dig) + inner join back on dig — the NULL-digest
    # row fell out of BOTH the counts and the per-source totals
    assert out == {"a": (3, 2), "b": (1, 1)}


# --------------------------------------------------- posexplode day flags


def test_rolling_reach_hll_emits_exactly_the_observed_days(
    spark, tmp_path
):
    """Sparse day pattern: trailing phantom days (day+1..day+6 of the
    last observed day) and mid-range unobserved days must NOT appear —
    the pos-0 flag must reproduce the old day-list inner join."""
    from metevents_spark.relational.product import rolling_reach_hll

    rows = []
    eid = 0
    for day, users in [(1, [1, 2]), (2, [2]), (12, [3])]:
        for u in users:
            eid += 1
            rows.append((u, eid, datetime(2024, 1, day)))
    spark.createDataFrame(
        rows, schema="user_id long, event_id long, ts timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = rolling_reach_hll(spark, str(tmp_path)).collect()
    assert [r.day.day for r in out] == [1, 2, 12]
    # day 2's trailing window covers day 1 and 2 -> both users
    est = {r.day.day: r.active_users_est for r in out}
    assert est[1] == 2.0 and est[2] == 2.0 and est[12] == 1.0
