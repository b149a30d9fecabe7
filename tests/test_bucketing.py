"""Bucketed-table layout: joins on the bucket key must be exchange-free
(the co-located-join contract for 100 TB fact tables)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from metevents_spark.io import bucketed_series_tables

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    ser_t, dim_t = bucketed_series_tables(spark, SF, n_buckets=8)
    ser, dim = spark.table(ser_t), spark.table(dim_t)
    joined = ser.join(dim, "sid").groupBy("sid").agg(
        F.count(F.lit(1)).alias("n"), F.max("avg_value").alias("avg_value")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() > 0
    # same join on the unbucketed frames shuffles — the layout is what
    # removes the exchange, not the query
    from metevents_spark.io import series_frame

    raw = series_frame(spark, SF)
    rdim = raw.groupBy("sid").agg(F.avg("value").alias("avg_value"))
    rplan = (
        raw.join(rdim, "sid")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" in rplan, rplan
