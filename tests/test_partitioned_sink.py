"""Date-partitioned sink: reads with a date predicate must prune
partitions (PartitionFilters at the scan, not a full-directory read)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metevents_spark.io import series_frame, write_partitioned_events

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    out = str(tmp_path / "events_by_date")
    write_partitioned_events(series_frame(spark, SF), out)

    back = spark.read.parquet(out).filter(F.col("event_date") == "2024-01-15")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan, plan
    n_pruned = back.count()
    n_full = (
        series_frame(spark, SF).filter(F.to_date("ts") == "2024-01-15").count()
    )
    assert n_pruned == n_full > 0
