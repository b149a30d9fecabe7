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

from metevents_spark.timeutil import epoch_us
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
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Each left row gains the matched right row's ``value_cols``:
    the most recent at-or-before row (``direction='backward'``), the
    earliest at-or-after row (``'forward'``), or whichever of the two
    is closer in time (``'nearest'``, backward wins ties) — pandas
    ``merge_asof`` surface (reference dep; pandas.merge_asof docs),
    including ``tolerance_s`` which voids matches farther than the
    given seconds.

    Both directions are O(rows) running windows over ONE sid exchange
    (the forward look orders descending rather than using an
    unbounded-following frame, which Spark recomputes per row). The
    matched row's timestamp and values are carried as a single struct,
    so a right row whose value column is NULL can never mix with a
    neighbor's timestamp.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest: {direction}")
    lt_cols = [c for c in left.columns if c not in (on, left_ts)]
    lt = left.select(
        F.col(on), F.col(left_ts).alias("_t"), F.lit(0).alias("_side"),
        *[F.col(c) for c in lt_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols],
    )
    rt = right.select(
        F.col(on), F.col(right_ts).alias("_t"), F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lt_cols],
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    unioned = lt.unionByName(rt)
    # the matched right row travels as ONE nullable struct
    payload = F.when(
        F.col("_side") == 1,
        F.struct(
            F.col("_t").alias("_rt"),
            *[F.col(f"_v_{c}").alias(c) for c in value_cols],
        ),
    )
    # right rows sort before left rows at equal timestamps in BOTH
    # orderings, so a same-instant right row is visible either way
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").desc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    look = []  # only the windows the direction needs (each is a sort)
    if direction in ("backward", "nearest"):
        look.append(F.last(payload, ignorenulls=True).over(w_back).alias("_back"))
    if direction in ("forward", "nearest"):
        look.append(F.last(payload, ignorenulls=True).over(w_fwd).alias("_fwd"))
    carried = unioned.select(
        F.col(on), F.col("_t"), F.col("_side"),
        *[F.col(c) for c in lt_cols],
        *look,
    ).filter(F.col("_side") == 0)

    def _gated(cand):
        """NULL the candidate when it misses the tolerance window."""
        if tolerance_s is None:
            return cand
        within = (
            F.abs(epoch_us(F.col("_t")) - epoch_us(cand["_rt"]))
            <= int(tolerance_s * 1_000_000)
        )
        return F.when(within, cand)

    if direction == "backward":
        chosen = _gated(F.col("_back"))
    elif direction == "forward":
        chosen = _gated(F.col("_fwd"))
    else:
        back, fwd = _gated(F.col("_back")), _gated(F.col("_fwd"))
        d_back = epoch_us(F.col("_t")) - epoch_us(back["_rt"])
        d_fwd = epoch_us(fwd["_rt"]) - epoch_us(F.col("_t"))
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_fwd < d_back, fwd)
            .otherwise(back)  # equidistant: backward wins (pandas)
        )
    return carried.select(
        F.col(on), F.col("_t").alias(left_ts),
        *[F.col(c) for c in lt_cols],
        *[chosen[c].alias(f"{c}{suffix}") for c in value_cols],
        chosen["_rt"].alias(f"{right_ts}{suffix}"),
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

    lb = left.withColumn("_lb", (epoch_us(F.col(left_ts)) / bucket_us).cast("long"))
    rb = right.withColumn(
        "_rb", (epoch_us(F.col(right_ts)) / bucket_us).cast("long")
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
                epoch_us(rb[right_ts]) - epoch_us(lbx[left_ts])
            )
            <= window_us
        )
        .drop(rb[on])
    )
    # each (left, right) pair matches exactly once: a right row lives in
    # one bucket and the left's three neighbor values are distinct
    return joined.drop("_lb", "_nb", "_rb")
