"""Series statistics beyond the reference's detectors: sliding-window
smoothing and per-series z-score anomalies.

The reference has no sliding/centered frames at all (SURVEY.md §2.4);
these add the rowsBetween sliding frame and the groupBy-stats + join
shapes over the same canonical (sid, seq, ts, value) frame, sharing its
single sid exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metevents_spark.io import series_frame


def rolling_mean(
    spark: SparkSession, sf_dir: str, window_rows: int = 3
) -> DataFrame:
    """Trailing moving average over each series (current row + the
    ``window_rows`` preceding rows; NULL values skipped by avg)."""
    df = series_frame(spark, sf_dir)
    w = (
        Window.partitionBy("sid")
        .orderBy("ts", "seq")
        .rowsBetween(-window_rows, 0)
    )
    return df.select(
        "sid", "seq", "ts",
        F.round(F.avg("value").over(w), 6).alias("rmean"),
    ).orderBy("sid", "ts", "seq")


def zscore_anomaly(
    spark: SparkSession, sf_dir: str, z_thresh: float = 3.0
) -> DataFrame:
    """Rows whose value deviates more than ``z_thresh`` sample standard
    deviations from the series mean. Stats and probe side shuffle on the
    same key (sid), so the join is co-partitioned."""
    df = series_frame(spark, sf_dir)
    stats = df.groupBy("sid").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sdev"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sdev"), 6)
    return (
        df.join(stats, "sid")
        .select("sid", "seq", "ts", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > z_thresh)
        .orderBy("sid", "ts", "seq")
    )
