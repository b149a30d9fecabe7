"""CUSUM change-point detection — the sequential drift detector the
reference's threshold detectors can't express (a slow mean shift never
trips a per-point threshold).

The textbook one-sided recursion S_i = max(0, S_{i-1} + z_i - k)
(slack k absorbs stationary noise so the statistic only accumulates
sustained shifts) looks stateful, but has a closed windowed form:
with C = running_sum(z - k), ``S_i = C_i - running_min(C)_i`` — and
the downward side is the same form over ``-z - k``. So the whole
two-sided detector is running frames over one (sid) exchange, O(n)
per series, fully whole-stage-codegen and expressible in ANSI SQL for
the oracle. No kernel, no recursion.
"""

from __future__ import annotations

from metevents_spark.timeutil import epoch_us  # noqa: F401  (series frame convention)
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metevents_spark.io import series_frame


def cusum_alarm(
    spark: SparkSession, sf_dir: str, h: float = 5.0, slack: float = 0.5
) -> DataFrame:
    """Rows where the two-sided CUSUM statistic exceeds ``h``: s_pos
    flags upward mean shifts, s_neg downward.

    z_i standardizes each point against ITS series' mean/std, so
    ``h`` and ``slack`` are in sigma units (the classic h=5, k=0.5
    tuning: ~0 false alarms on stationary noise, fast detection of
    sustained >=1-sigma shifts — without the slack a stationary
    series' statistic random-walks past any threshold). NULL/NaN
    points are excluded up front — a NaN would poison every later
    cumulative sum, and NaN comparison semantics differ across
    engines.
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
    z = (F.col("value") - F.avg("value").over(wp)) / F.stddev_samp(
        "value"
    ).over(wp)
    stat = (
        df.withColumn("dp", z - slack)
        .withColumn("dn", -z - slack)
        .withColumn("cp", F.sum("dp").over(run))
        .withColumn("cn", F.sum("dn").over(run))
        .withColumn("s_pos", F.round(F.col("cp") - F.min("cp").over(run), 6))
        .withColumn("s_neg", F.round(F.col("cn") - F.min("cn").over(run), 6))
    )
    return (
        stat.filter((F.col("s_pos") > h) | (F.col("s_neg") > h))
        .select("sid", "seq", "ts", "value", "s_pos", "s_neg")
        .orderBy("sid", "ts", "seq")
    )
