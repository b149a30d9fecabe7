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
from pyspark.sql import DataFrame
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
