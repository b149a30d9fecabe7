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


def test_upsert_partitioned_merges_and_leaves_untouched_partitions(
    spark, tmp_path
):
    import os

    from metevents_spark.io import upsert_partitioned

    out = str(tmp_path / "events_upsert")
    base = series_frame(spark, SF).select("sid", "seq", "ts", "value")
    upsert_partitioned(spark, base, out, key_cols=["sid", "seq"])
    n0 = spark.read.parquet(out).count()
    assert n0 == base.count()

    # snapshot file mtimes per partition directory
    def files(p):
        return {
            os.path.join(d, f): os.path.getmtime(os.path.join(d, f))
            for d, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        }

    before = files(out)

    # batch 2: bump the value of every row on one day, add one new row
    day = "2024-01-15"
    upd = (
        base.filter(F.to_date("ts") == day)
        .withColumn("value", F.col("value") + 1000.0)
        # same (sid, seq) key and same ts: the update must beat the
        # table row via source priority
    )
    one_new = base.limit(0).unionByName(
        spark.createDataFrame(
            [("brandnew", 999999, __import__("datetime").datetime(2024, 1, 15, 12), 42.0)],
            "sid string, seq long, ts timestamp, value double",
        )
    )
    upsert_partitioned(
        spark, upd.unionByName(one_new), out, key_cols=["sid", "seq"]
    )

    back = spark.read.parquet(out)
    assert back.count() == n0 + 1  # upserts replaced, one insert
    # every updated key carries the new value
    got = back.filter(F.col("event_date") == day)
    assert got.filter(F.col("sid") != "brandnew").filter(
        F.col("value") < 1000.0
    ).count() == 0
    assert got.filter(F.col("sid") == "brandnew").count() == 1
    # untouched partitions: identical files, untouched mtimes
    after = files(out)
    untouched_before = {p: m for p, m in before.items() if f"event_date={day}" not in p}
    untouched_after = {p: m for p, m in after.items() if f"event_date={day}" not in p}
    assert untouched_before == untouched_after


def test_table_format_roundtrip(spark, tmp_path):
    """Every TABLE_FORMATS entry must round-trip the canonical series
    frame value-identically (ORC is the Hive-interop path, JSONL the
    interchange sink; timestamps survive via the explicit read
    schema)."""
    from metevents_spark.io import (
        TABLE_FORMATS,
        read_events,
        series_frame,
        write_events,
    )

    src = series_frame(spark, "/root/testdata/sf0.001")
    want = sorted(
        (r.sid, r.seq, r.ts, r.value)
        for r in src.collect()
    )
    schema = "sid string, seq long, ts timestamp_ntz, value double"
    for fmt in TABLE_FORMATS:
        p = str(tmp_path / f"rt_{fmt}")
        write_events(src, p, fmt=fmt)
        got = sorted(
            (r.sid, r.seq, r.ts, r.value)
            for r in read_events(spark, p, fmt=fmt, schema=schema).collect()
        )
        assert got == want, fmt

    import pytest

    with pytest.raises(ValueError):
        write_events(src, str(tmp_path / "bad"), fmt="avro")


def test_compaction_reduces_files_preserves_content(spark, tmp_path):
    """Writing with absurdly many shuffle slices litters each date
    partition with small files; compaction must collapse them to the
    data-driven count while leaving every row byte-identical."""
    from metevents_spark.io import compact_partitions

    src = series_frame(spark, "/root/testdata/sf0.001")
    p = str(tmp_path / "compact_me")
    # fragment: 16 files per partition regardless of size
    (
        src.withColumn("event_date", F.to_date("ts"))
        .repartition(16)
        .write.partitionBy("event_date")
        .parquet(p)
    )
    before = sorted(
        (r.sid, r.seq, r.ts, r.value)
        for r in spark.read.parquet(p)
        .select("sid", "seq", "ts", "value")
        .collect()
    )

    stats = compact_partitions(spark, p, target_rows_per_file=10_000)

    after = sorted(
        (r.sid, r.seq, r.ts, r.value)
        for r in spark.read.parquet(p)
        .select("sid", "seq", "ts", "value")
        .collect()
    )
    assert after == before
    assert stats["rows"] == len(before)
    # every sf0.001 partition holds far fewer than 10k rows, so each
    # collapses to exactly ONE file
    import glob

    parts = glob.glob(f"{p}/event_date=*")
    assert stats["files_after"] == len(parts)
    assert stats["files_after"] < stats["files_before"]
