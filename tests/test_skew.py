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
