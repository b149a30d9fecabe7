"""Materialize an sf1-equivalent dataset by replicating sf0.1 tenfold
with fresh keys, for the endurance bench (bench.py with
SPARK_GRAFT_SF_DIR pointed here).

Usage: python tools/make_bigscale.py [factor] [out_dir]

Replication rules (the point is 10x MORE entities, not 10 copies of
the same entity, so per-operator cost scales the way a real sf1 would):

- region/nation: fixed dimensions, copied once.
- customer/supplier/part/orders/lineitem/events/embeddings: keys get a
  per-copy offset large enough to never collide; foreign keys get the
  same offset so referential integrity survives.
- documents: every token is prefixed with a copy marker, giving each
  copy a DISJOINT vocabulary. Without this, copies are 100%-similar
  near-duplicates of each other and every pairwise operator's
  candidate sets grow quadratically in the factor — a duplication
  stress test, not a scale test. (The corpus's own intra-copy
  duplication structure is preserved exactly.)
- embeddings: vectors get a tiny per-copy deterministic perturbation
  so identical-vector collapse doesn't hide the 10x corpus growth.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

KEY_OFFSETS = {
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
    "events": {"event_id": 1_000_000_000, "user_id": 10_000_000},
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else f"/tmp/metevents-sfbig-x{factor}"
    )
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from metevents_spark.io import TABLES, load_table
    from metevents_spark.session import get_spark

    spark = get_spark(app_name="make-bigscale")
    spark.sparkContext.setLogLevel("ERROR")
    copies = spark.range(factor).select(F.col("id").alias("copy"))

    for t in TABLES:
        dest = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dest):
            print(f"skip {t} (exists)")
            continue
        df = load_table(spark, BASE, t)
        if t in ("region", "nation"):
            big = df
        elif t == "documents":
            big = df.crossJoin(copies).select(
                (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda tok: F.concat(
                            F.lit("c"), F.col("copy"), F.lit("x"), tok
                        ),
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text"))
        elif t == "embeddings":
            cols = [c for c in df.columns if c != "embedding"]
            id_col = cols[0]
            big = df.crossJoin(copies).select(
                (F.col(id_col) + F.col("copy") * 10_000_000).alias(id_col),
                F.transform(
                    "embedding",
                    lambda v: v + F.col("copy").cast("float") * F.lit(1e-4),
                ).alias("embedding"),
                *[c for c in cols[1:]],
            )
        else:
            offs = KEY_OFFSETS[t]
            exprs = [
                (
                    (F.col(c) + F.col("copy") * offs[c]).alias(c)
                    if c in offs
                    else F.col(c)
                )
                for c in df.columns
            ]
            big = df.crossJoin(copies).select(*exprs)
        big.write.mode("overwrite").parquet(dest)
        print(f"wrote {t}: {spark.read.parquet(dest).count()} rows")
    spark.stop()
    print(out_dir)


if __name__ == "__main__":
    main()
