"""Interval × interval overlap join — the temporal join class the
series operators' outputs feed (events, sessions, storms, and gap runs
are all (key, start, stop) interval sets; "which error windows touched
which purchase sessions" is an overlap join over two of them).

Scale design: the naive formulation is a key-equi join with an
inequality pair (``l.start <= r.stop AND r.start <= l.stop``) — Spark
plans that as a key join whose per-key output is then filtered, which
degenerates to a per-key cartesian for hot keys. Instead both sides
explode into fixed-width time buckets spanning each interval and join
on (key, bucket) — candidate pairs only ever form inside one bucket of
one key. De-duplication needs no ``distinct`` shuffle: an overlapping
pair is CLAIMED exactly once, by the bucket containing the overlap's
left edge (``greatest(l.start, r.start)``; both intervals span that
instant, and ``floor`` is monotone so that bucket equals
``greatest(floor(l.start/B), floor(r.start/B))`` — computable from the
joined row alone). Bucket expansion is |interval|/B + 1 rows per side,
bounded when ``bucket_s`` is chosen near the typical interval length.
"""

from __future__ import annotations

from metevents_spark.timeutil import epoch_us
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _explode_buckets(
    df: DataFrame, start: str, stop: str, bucket_us: int
) -> DataFrame:
    b0 = (epoch_us(F.col(start)) / bucket_us).cast("long")
    b1 = (epoch_us(F.col(stop)) / bucket_us).cast("long")
    return df.select(
        "*",
        F.explode(F.sequence(b0, b1)).alias("_bucket"),
        b0.alias("_b0"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "sid",
    start_col: str = "start",
    stop_col: str = "stop",
    bucket_s: float = 86400.0,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All (left, right) interval pairs with equal ``on`` key and
    closed-interval overlap ``l.start <= r.stop AND r.start <= l.stop``.

    Output: ``on``, every non-key left column suffixed ``suffixes[0]``,
    every non-key right column suffixed ``suffixes[1]``, plus
    ``overlap_us`` (width of the intersection, >= 0).
    """
    bucket_us = int(bucket_s * 1_000_000)
    sa, sb = suffixes
    lcols = [c for c in left.columns if c != on]
    rcols = [c for c in right.columns if c != on]
    l = _explode_buckets(
        left.select(on, *[F.col(c).alias(f"{c}{sa}") for c in lcols]),
        f"{start_col}{sa}",
        f"{stop_col}{sa}",
        bucket_us,
    ).withColumnsRenamed({"_bucket": "_lbucket", "_b0": "_lb0"})
    r = _explode_buckets(
        right.select(on, *[F.col(c).alias(f"{c}{sb}") for c in rcols]),
        f"{start_col}{sb}",
        f"{stop_col}{sb}",
        bucket_us,
    ).withColumnsRenamed({"_bucket": "_rbucket", "_b0": "_rb0"})

    ls, lt = F.col(f"{start_col}{sa}"), F.col(f"{stop_col}{sa}")
    rs, rt = F.col(f"{start_col}{sb}"), F.col(f"{stop_col}{sb}")
    joined = (
        l.join(r.withColumnRenamed(on, "_ron"),
               (F.col(on) == F.col("_ron"))
               & (F.col("_lbucket") == F.col("_rbucket")))
        .filter((ls <= rt) & (rs <= lt))
        # claim: only the bucket holding the overlap's left edge emits
        .filter(F.col("_lbucket") == F.greatest("_lb0", "_rb0"))
    )
    return joined.select(
        on,
        *[f"{c}{sa}" for c in lcols],
        *[f"{c}{sb}" for c in rcols],
        (
            epoch_us(F.least(lt, rt)) - epoch_us(F.greatest(ls, rs))
        ).alias("overlap_us"),
    )


def interval_coverage(
    spark, sf_dir: str, cover_minutes: int = 15
) -> "DataFrame":
    """Per-user union of overlapping activity windows (gaps-and-islands):
    each event covers [ts, ts + cover_minutes); merge overlapping covers
    per user and report how many merged intervals remain, the total and
    longest covered spans, and covered hours.

    The sweep is the classic window formulation: ordered by start, an
    island begins where the start exceeds the running MAX of all
    previous stops; island ids are the running count of island starts.
    Everything is integer microsecond arithmetic — exact in any engine.

    Scale shape: one hash exchange on sid, two window passes over the
    sorted run (running max, running island count), one aggregate —
    no self-join, no interval explosion. This is the cheap statistic;
    the pairwise overlap JOIN lives in interval_overlap_join above.
    """
    from metevents_spark.io import series_frame

    spark_df = series_frame(spark, sf_dir)
    cover_us = cover_minutes * 60 * 1_000_000

    start_us = epoch_us(F.col("ts"))
    w = Window.partitionBy("sid").orderBy("ts", "seq")
    prev_max_stop = F.max(F.col("stop_us")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    base = spark_df.select(
        "sid",
        "ts",
        "seq",
        start_us.alias("start_us"),
        (start_us + F.lit(cover_us)).alias("stop_us"),
    )
    islanded = (
        base.withColumn(
            "new_island",
            F.when(
                prev_max_stop.isNull()
                | (F.col("start_us") > prev_max_stop),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    islands = islanded.groupBy("sid", "island").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("stop_us") - F.min("start_us")).alias("span_us"),
    )
    return (
        islands.groupBy("sid")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("span_us").alias("covered_us"),
            F.max("span_us").alias("longest_us"),
        )
        .select(
            "sid",
            "n_events",
            "n_intervals",
            "covered_us",
            "longest_us",
            F.round(F.col("covered_us") / F.lit(3.6e9), 6).alias(
                "covered_hours"
            ),
        )
        .orderBy("sid")
    )
