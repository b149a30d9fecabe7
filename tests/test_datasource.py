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
