"""Gaps-and-islands run grouping — the engine's core kernel.

Reference semantics (metevents/events.py:39-47 ``group_condition_by_time``):
``ind_sum = ind.eq(False).cumsum()`` assigns a stable id to each run of
consecutive True rows; rows where ``ind`` is False (or, for us, NULL)
increment the counter and are excluded from events.

Spark mapping: a running-sum window over ``(sid)`` ordered by
``(ts, seq)`` — one hash exchange on sid + one sort, shared by every
downstream per-series window in the same plan (Catalyst reuses the
partitioning/ordering, so lag-diff + cumsum + groupBy cost a single
shuffle). At scale the unit of parallelism is the series key, not the
series length; no driver-side collection anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from metevents_spark.timeutil import epoch_us
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PART_COLS: tuple[str, ...] = ("sid",)
ORDER_COLS: tuple[str, ...] = ("ts", "seq")

#: Schema of every events frame the engine produces.
EVENT_COLS = ("sid", "start", "stop", "duration_us", "n_points", "total")


def series_window(
    part_cols: Sequence[str] = PART_COLS, order_cols: Sequence[str] = ORDER_COLS
):
    """The one window spec shared by diff/cumsum so plans sort once."""
    return Window.partitionBy(*part_cols).orderBy(*order_cols)


def flag_runs(
    df: DataFrame,
    cond: Column,
    part_cols: Sequence[str] = PART_COLS,
    order_cols: Sequence[str] = ORDER_COLS,
) -> DataFrame:
    """Add ``cond`` (boolean) and ``run_id`` (long) columns.

    NULL conditions behave like the reference's False (pandas boolean
    masks never contain NaN: comparisons with NaN yield False —
    metevents/events.py:73,316,345): the row increments the run counter
    and is excluded from any event.
    """
    w = (
        series_window(part_cols, order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inc = F.when(cond, F.lit(0)).otherwise(F.lit(1))
    return df.withColumn("cond", cond).withColumn("run_id", F.sum(inc).over(w))


def runs_to_events(
    flagged: DataFrame,
    part_cols: Sequence[str] = PART_COLS,
    value_col: str = "value",
) -> DataFrame:
    """Collapse flagged runs into one event row each.

    Reference: per-group index min/max (metevents/periods.py:12-22),
    duration = stop - start (periods.py:24-28), NaN-skipping total
    (periods.py:40-45 — Spark ``sum`` skips NULLs, matching pandas
    skipna). Partial (map-side) aggregation is free via HashAggregate.
    """
    return (
        flagged.filter(F.col("cond"))
        .groupBy(*part_cols, "run_id")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("stop"),
            F.count(F.lit(1)).alias("n_points"),
            F.sum(value_col).alias("total"),
        )
        .withColumn(
            "duration_us", epoch_us(F.col("stop")) - epoch_us(F.col("start"))
        )
        .select(*part_cols, "start", "stop", "duration_us", "n_points", "total")
    )


def detect(
    df: DataFrame,
    cond: Column,
    part_cols: Sequence[str] = PART_COLS,
    order_cols: Sequence[str] = ORDER_COLS,
) -> DataFrame:
    """predicate -> run grouping -> event aggregation, time-ordered.

    The ordering matches the reference's sorted group emission
    (metevents/events.py:81,190,289,321,350,402).
    """
    ev = runs_to_events(flag_runs(df, cond, part_cols, order_cols), part_cols)
    return ev.orderBy(*part_cols, "start")
