"""Spark 4 Python DataSource for stations: partition-per-station scan
must agree with the plain parquet series_frame path."""

from __future__ import annotations

from metevents_spark.io import series_frame
from metevents_spark.sources.datasource import register_station_source

SF = "/root/testdata/sf0.001"


def test_station_source_matches_series_frame(spark):
    register_station_source(spark)
    via_source = (
        spark.read.format("station")
        .option("path", SF)
        .option("stations", "0,1,2")
        .load()
        .orderBy("sid", "ts", "seq")
        .collect()
    )
    via_frame = (
        series_frame(spark, SF)
        .filter("sid IN ('0','1','2')")
        .orderBy("sid", "ts", "seq")
        .collect()
    )
    assert len(via_source) == len(via_frame) > 0
    assert [tuple(r) for r in via_source] == [tuple(r) for r in via_frame]


def test_station_source_discovers_partitions(spark):
    register_station_source(spark)
    df = spark.read.format("station").option("path", SF).load()
    expected = series_frame(spark, SF).select("sid").distinct().count()
    assert df.select("sid").distinct().count() == expected > 0


def test_station_stream_reader_tails_new_rows(spark, tmp_path):
    """The streaming station source is an event_id-watermark tail:
    first micro-batch delivers the current store, later batches deliver
    ONLY rows appended since the committed offset — no replays, no
    gaps."""
    import duckdb

    register_station_source(spark)
    store = str(tmp_path / "events.parquet")
    src = "/root/testdata/sf0.001/events.parquet"
    duckdb.sql(
        f"COPY (SELECT * FROM '{src}' WHERE event_id < 60) TO '{store}'"
    )

    stream = (
        spark.readStream.format("station").option("path", store).load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("station_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql(
            "SELECT COUNT(*) AS n, MAX(seq) AS mx FROM station_tail"
        ).collect()[0]
        assert first.n == 60 and first.mx == 59

        # grow the store; the next micro-batch must pick up ONLY the
        # tail. Stage + atomic rename: COPY writing over the live file
        # in place races the stream's latestOffset poll, which can
        # catch a truncated parquet mid-write and kill the query (a
        # real ingest would also atomically swap files).
        import os

        staged = store + ".staged"
        duckdb.sql(
            f"COPY (SELECT * FROM '{src}' WHERE event_id < 100) "
            f"TO '{staged}' (FORMAT PARQUET)"
        )
        os.replace(staged, store)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT seq, COUNT(*) AS c FROM station_tail GROUP BY seq "
            "HAVING COUNT(*) > 1"
        ).collect()
        assert rows == []  # no duplicates across batches
        total = spark.sql(
            "SELECT COUNT(*) AS n, MAX(seq) AS mx FROM station_tail"
        ).collect()[0]
        assert total.n == 100 and total.mx == 99
    finally:
        q.stop()
