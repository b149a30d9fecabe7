"""Resampling: irregular series -> regular time grid, with forward-fill
and linear interpolation for the holes.

The reference operates on whatever index the pandas series carries and
has no resample/interpolate step (its `data_gap` detector FINDS holes,
reference metevents/events.py:198-214, but nothing fills them). Any
production consumer of station data regularizes the series before
modeling, so this supplies the missing half: `gap_fill_hourly` buckets
each series to an hourly grid, then repairs empty buckets two ways
(last-observation-carried-forward and linear interpolation between the
bracketing observations).

Scale shape: the raw scan collapses to per-(sid, hour) aggregates
FIRST (partial aggregation map-side, one exchange carrying at most
|sids| x |hours| rows regardless of raw event volume). Grid generation
is a per-sid min/max aggregate + `sequence()` explode — output-sized,
never row-sized. The fill windows partition by sid over the hourly
grid, so the expensive raw data is touched exactly once.
"""

from __future__ import annotations

from metevents_spark.timeutil import epoch_us
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metevents_spark.io import series_frame


def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of each series with LOCF and linear
    interpolation.

    Output per (sid, hour-slot between the series' first and last
    observed hour): the hourly mean (`v_hour`, NULL in gap slots),
    observation count (`n_hour`), forward-filled value (`v_ffill`),
    and linearly interpolated value (`v_interp`; equals v_hour on
    observed slots, clamps to the nearest observed value at the
    edges).
    """
    df = series_frame(spark, sf_dir)
    hr = F.date_trunc("hour", F.col("ts"))
    hourly = (
        df.groupBy("sid", hr.alias("hr"))
        .agg(
            F.round(F.avg("value"), 6).alias("v_hour"),
            F.count("value").alias("n_hour"),
        )
    )
    bounds = hourly.groupBy("sid").agg(
        F.min("hr").alias("hr_lo"), F.max("hr").alias("hr_hi")
    )
    grid = bounds.select(
        "sid",
        F.explode(
            F.expr("sequence(hr_lo, hr_hi, interval 1 hour)")
        ).alias("hr"),
    )
    g = grid.join(hourly, ["sid", "hr"], "left")

    w_back = (
        Window.partitionBy("sid")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward look runs on a DESCENDING running frame: a
    # (currentRow, unboundedFollowing) frame recomputes its aggregate
    # per row in Spark — O(rows^2) per series (measured 93 s vs 3 s at
    # sf0.1) — while both running frames are a single O(rows) pass;
    # same sid exchange, one extra in-partition sort.
    w_fwd = (
        Window.partitionBy("sid")
        .orderBy(F.col("hr").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_hr = F.when(F.col("v_hour").isNotNull(), F.col("hr"))
    prev_v = F.last("v_hour", ignorenulls=True).over(w_back)
    prev_t = F.last(obs_hr, ignorenulls=True).over(w_back)
    next_v = F.last("v_hour", ignorenulls=True).over(w_fwd)
    next_t = F.last(obs_hr, ignorenulls=True).over(w_fwd)
    frac = (
        (epoch_us(F.col("hr")) - epoch_us(prev_t)).cast("double")
        / (epoch_us(next_t) - epoch_us(prev_t)).cast("double")
    )
    # NOT rounded: the inputs (6-digit hourly means, exact micros
    # ratios) are already cross-engine stable, and the same IEEE
    # expression tree yields bit-identical doubles — while round()
    # ties at digit 7 (frac is a dyadic rational) resolve differently
    # per engine's double->decimal path.
    interp = (
        F.when(F.col("v_hour").isNotNull(), F.col("v_hour"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return (
        g.select(
            "sid",
            "hr",
            "v_hour",
            F.coalesce("n_hour", F.lit(0)).alias("n_hour"),
            prev_v.alias("v_ffill"),
            interp.alias("v_interp"),
        )
        .orderBy("sid", "hr")
    )
