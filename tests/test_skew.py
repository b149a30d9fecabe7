"""salted_join must be result-identical to the plain join while
spreading each key over n_salts shuffle partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from metevents_spark.io import load_table
from metevents_spark.operators.skew import salted_join

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    line = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, SF, "part").select("p_partkey", "p_brand")
    plain = (
        line.join(part, line.l_partkey == part.p_partkey)
        .groupBy("p_brand").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 3).alias("qty"),
        )
    )
    part_k = part.withColumnRenamed("p_partkey", "l_partkey")
    salted = (
        salted_join(line, part_k, ["l_partkey"], n_salts=4)
        .groupBy("p_brand").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 3).alias("qty"),
        )
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_rejects_build_preserving_how(spark):
    import pytest

    line = load_table(spark, SF, "lineitem").select("l_partkey")
    part = (
        load_table(spark, SF, "part")
        .select("p_partkey")
        .withColumnRenamed("p_partkey", "l_partkey")
    )
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="probe-preserving"):
            salted_join(line, part, ["l_partkey"], how=how)


def test_salted_join_left_and_semi(spark):
    """left / left_semi / left_anti survive the salt: unmatched PROBE
    rows appear exactly once, and semi/anti sets equal the plain ones."""
    probe = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, v string"
    )
    build = spark.createDataFrame([(1, 10), (2, 20)], "k int, w int")
    for how in ("left", "left_semi", "left_anti"):
        plain = probe.join(build, ["k"], how)
        salted = salted_join(probe, build, ["k"], n_salts=4, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how


def test_events_above_type_avg_matches_plain_join(spark):
    """The registry query (salted path) equals the identical plan with
    a plain join — the end-to-end skew-remedy demonstration."""
    from metevents_spark.io import load_table as lt
    from metevents_spark.operators.skew import events_above_type_avg

    salted_rows = sorted(
        map(tuple, events_above_type_avg(spark, SF).collect())
    )
    ev = lt(spark, SF, "events").select(
        "user_id",
        "event_type",
        F.expr("CAST(ROUND(value * 1e6) AS BIGINT)").alias("value_us"),
    )
    ts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_type"), F.sum("value_us").alias("sum_us")
    )
    plain = (
        ev.join(ts, "event_type")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.col("value_us") * F.col("n_type") > F.col("sum_us"), 1
                ).otherwise(0)
            ).alias("n_above_type_avg"),
        )
        .orderBy("user_id")
    )
    assert salted_rows == sorted(map(tuple, plain.collect()))


def test_salt_bounds_hot_key_partitions(spark):
    """The remedy's point: after salting, the largest (key, salt) group
    is ~n_salts-fold smaller than the hot key itself, so no single
    reducer sees the whole hot key."""
    from pyspark.sql.functions import pmod, xxhash64

    n_salts = 8
    ev = load_table(spark, SF, "events").select("user_id", "event_type", "value")
    plain_max = (
        ev.groupBy("event_type").count().agg(F.max("count")).collect()[0][0]
    )
    salted = ev.withColumn(
        "_salt",
        pmod(xxhash64(*[F.col(c) for c in ev.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    salted_max = (
        salted.groupBy("event_type", "_salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # perfectly uniform would be plain_max / n_salts; allow 2x slack for
    # hash variance on the small fixture
    assert salted_max <= 2 * plain_max / n_salts, (plain_max, salted_max)
