"""As-of and range joins — temporal operators Spark lacks natively.

As-of join (most recent right-side row at or before each left row) is
implemented with the scalable union+window pattern: tag both sides,
union, one window partitioned by key ordered by time, and
``last_value(..., ignoreNulls)`` carries the latest right-side values
forward onto left rows. One shuffle on the join key; no per-group
pandas, no merge_asof, no skew-prone range condition.

Range join (all right rows within a window around each left row) uses
time bucketization: equi-join on (key, bucket) over the left bucket and
its neighbors, then the exact range filter. Turns an inequality join —
which Spark plans as a broadcast-nested-loop — into an equi-join that
shuffles on (key, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "sid",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_right",
) -> DataFrame:
    """Each left row gains the most recent right row's ``value_cols``
    (at or before its timestamp; right wins ties)."""
    lt = left.select(
        F.col(on), F.col(left_ts).alias("_t"), F.lit(0).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (on, left_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in value_cols],
        F.lit(None).cast("timestamp").alias(f"{right_ts}{suffix}"),
    )
    rt_cols = [c for c in left.columns if c not in (on, left_ts)]
    rt = right.select(
        F.col(on), F.col(right_ts).alias("_t"), F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in rt_cols],
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    unioned = lt.unionByName(rt)
    # right rows sort before left rows at equal timestamps so a
    # same-instant right row is visible to the left row (ties: right wins)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        F.col(on), F.col("_t"), F.col("_side"),
        *[F.col(c) for c in rt_cols],
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.last(F.col(f"{right_ts}{suffix}"), ignorenulls=True)
        .over(w)
        .alias(f"{right_ts}{suffix}"),
    )
    return carried.filter(F.col("_side") == 0).drop("_side").withColumnRenamed(
        "_t", left_ts
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "sid",
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_s: float = 3600.0,
    bucket_s: float | None = None,
) -> DataFrame:
    """All (left, right) pairs with same key and
    |right_ts - left_ts| <= window_s, via bucketized equi-join."""
    if bucket_s is None:
        bucket_s = window_s
    bucket_us = int(bucket_s * 1_000_000)
    window_us = int(window_s * 1_000_000)

    lb = left.withColumn("_lb", (F.unix_micros(F.col(left_ts)) / bucket_us).cast("long"))
    rb = right.withColumn(
        "_rb", (F.unix_micros(F.col(right_ts)) / bucket_us).cast("long")
    )
    neighbors = F.explode(
        F.array(F.col("_lb") - 1, F.col("_lb"), F.col("_lb") + 1)
    ).alias("_nb")
    lbx = lb.select("*", neighbors)
    joined = (
        lbx.join(
            rb,
            (lbx[on] == rb[on]) & (F.col("_nb") == F.col("_rb")),
        )
        .filter(
            F.abs(
                F.unix_micros(rb[right_ts]) - F.unix_micros(lbx[left_ts])
            )
            <= window_us
        )
        .drop(rb[on])
    )
    # each (left, right) pair matches exactly once: a right row lives in
    # one bucket and the left's three neighbor values are distinct
    return joined.drop("_lb", "_nb", "_rb")
