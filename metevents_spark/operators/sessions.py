"""Sessionization — gaps-and-islands over inter-event time.

Generalizes the reference's run grouping (metevents/events.py:39-47)
from boolean conditions to inactivity gaps: a new session starts when
the delta to the previous event exceeds ``gap_s``. Same single-shuffle
window-cumsum shape; the batch-SQL dual of Structured Streaming's
``session_window``.
"""

from __future__ import annotations

from metevents_spark.timeutil import epoch_us
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metevents_spark.operators.runs import series_window


def sessionize(
    df: DataFrame, gap_s: float = 14400.0, by: tuple[str, ...] = ("sid",)
) -> DataFrame:
    """-> (*by, session_id, start, stop, duration_us, n_events, total)

    ``by`` extends the session key beyond the series id (e.g.
    ``("sid", "event_type")`` sessionizes every event type of every
    user in ONE scan and one exchange instead of one pipeline per
    type); session_id numbering restarts per key group.
    """
    gap_us = int(gap_s * 1_000_000)
    keys = list(by)
    w = (
        series_window()
        if keys == ["sid"]
        else Window.partitionBy(*keys).orderBy("ts", "seq")
    )
    delta = epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w))
    new_session = F.when(delta.isNull() | (delta > gap_us), 1).otherwise(0)
    cum = Window.partitionBy(*keys).orderBy("ts", "seq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("session_id", F.sum(new_session).over(cum))
        .groupBy(*keys, "session_id")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("stop"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total"),
        )
        .withColumn(
            "duration_us", epoch_us(F.col("stop")) - epoch_us(F.col("start"))
        )
        .select(*keys, "session_id", "start", "stop", "duration_us",
                "n_events", "total")
        .orderBy(*keys, "session_id")
    )


def burst_collapse(
    spark, sf_dir: str, refractory_minutes: int = 30
):
    """Telemetry debounce: collapse each burst of same-type events per
    user (consecutive events closer than ``refractory_minutes``) to its
    FIRST event, reporting how many rows the burst contained and its
    span — the event-stream member of the dedup tier (retry storms and
    double-fires inflate downstream counts; debouncing at ingest is
    the standard fix).

    Gaps-and-islands per (user, type): a burst starts where the gap
    from the previous same-type event exceeds the refractory window.
    Pure integer microsecond window algebra — engine-exact.

    Scale shape: ONE hash exchange on (sid, event_type), two window
    passes, one aggregate; output is burst heads, bounded by the
    debounced event count.
    """
    from metevents_spark.io import load_table
    from metevents_spark.timeutil import epoch_us
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("sid"),
        F.col("event_id").cast("long").alias("seq"),
        "event_type",
        "ts",
    )
    gap_us = refractory_minutes * 60 * 1_000_000
    w = Window.partitionBy("sid", "event_type").orderBy("ts", "seq")
    prev = F.lag(epoch_us(F.col("ts"))).over(w)
    islanded = ev.withColumn(
        "new_burst",
        F.when(
            prev.isNull() | ((epoch_us(F.col("ts")) - prev) > gap_us), 1
        ).otherwise(0),
    ).withColumn(
        "burst",
        F.sum("new_burst").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islanded.groupBy("sid", "event_type", "burst")
        .agg(
            F.min("ts").alias("first_ts"),
            F.min("seq").alias("first_seq"),
            F.count(F.lit(1)).alias("n_collapsed"),
            (epoch_us(F.max("ts")) - epoch_us(F.min("ts"))).alias("span_us"),
        )
        .select(
            "sid", "event_type", "first_ts", "first_seq",
            "n_collapsed", "span_us",
        )
        .orderBy("sid", "event_type", "first_ts", "first_seq")
    )
