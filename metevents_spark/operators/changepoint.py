"""CUSUM change-point detection — the sequential drift detector the
reference's threshold detectors can't express (a slow mean shift never
trips a per-point threshold).

The textbook recursion S_i = max(0, S_{i-1} + d_i) looks stateful, but
has a closed windowed form: with C = running_sum(d),
``S_i = C_i - running_min(C)_i`` (and the downward side
``running_max(C)_i - C_i``) — so the whole detector is three running
frames over one (sid) exchange, O(n) per series, fully
whole-stage-codegen and expressible in ANSI SQL for the oracle. No
kernel, no recursion.
"""

from __future__ import annotations

from metevents_spark.timeutil import epoch_us  # noqa: F401  (series frame convention)
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metevents_spark.io import series_frame


def cusum_alarm(
    spark: SparkSession, sf_dir: str, h: float = 5.0
) -> DataFrame:
    """Rows where the standardized CUSUM statistic exceeds ``h`` in
    either direction: s_pos flags upward mean shifts, s_neg downward.

    d_i standardizes each point against ITS series' mean/std (so ``h``
    is in sigma units); NULL/NaN points are excluded up front — a NaN
    would poison every later cumulative sum, and NaN comparison
    semantics differ across engines.
    """
    df = series_frame(spark, sf_dir).filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    wp = Window.partitionBy("sid")
    run = (
        Window.partitionBy("sid")
        .orderBy("ts", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (F.col("value") - F.avg("value").over(wp)) / F.stddev_samp(
        "value"
    ).over(wp)
    stat = (
        df.withColumn("d", d)
        .withColumn("c", F.sum("d").over(run))
        .withColumn("s_pos", F.round(F.col("c") - F.min("c").over(run), 6))
        .withColumn("s_neg", F.round(F.max("c").over(run) - F.col("c"), 6))
    )
    return (
        stat.filter((F.col("s_pos") > h) | (F.col("s_neg") > h))
        .select("sid", "seq", "ts", "value", "s_pos", "s_neg")
        .orderBy("sid", "ts", "seq")
    )
