"""Per-series sampling-frequency inference.

Reference (metevents/utilities.py:2-15): the unique consecutive deltas
of ``index[1:-1] - index[0:-2]`` — note the reference's own off-by-one
drops the final delta, replicated here for parity — give the series
frequency when exactly one unique delta exists, else None.

Spark mapping: one pass — lag-delta window, drop the first and last
delta per series, countDistinct + min per sid. Single shuffle on sid.
"""

from __future__ import annotations

from metevents_spark.timeutil import epoch_us
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metevents_spark.operators.runs import series_window


def freq_infer(df: DataFrame) -> DataFrame:
    """-> (sid, n_deltas, n_distinct, freq_us nullable).

    ``freq_us`` is the single unique delta in microseconds when the
    series is regular, NULL otherwise.
    """
    w = series_window()
    rn = F.row_number().over(w)
    cnt = F.count(F.lit(1)).over(Window.partitionBy("sid"))
    delta = epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w))
    deltas = (
        df.withColumn("rn", rn)
        .withColumn("n", cnt)
        .withColumn("delta_us", delta)
        # pandas index[1:-1] - index[0:-2]: deltas ending at rows
        # 2 .. n-1 (1-indexed), i.e. drop the first row's NULL delta
        # and the last row's delta.
        .filter((F.col("rn") >= 2) & (F.col("rn") <= F.col("n") - 1))
    )
    return (
        deltas.groupBy("sid")
        .agg(
            F.count("delta_us").alias("n_deltas"),
            F.countDistinct("delta_us").alias("n_distinct"),
            F.min("delta_us").alias("min_delta_us"),
        )
        .withColumn(
            "freq_us",
            F.when(F.col("n_distinct") == 1, F.col("min_delta_us")).otherwise(
                F.lit(None)
            ),
        )
        .select("sid", "n_deltas", "n_distinct", "freq_us")
        .orderBy("sid")
    )
