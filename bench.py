"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Materialization via the noop sink (full column evaluation, no driver
collect, no disk) so timings reflect plan execution, not result
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "extreme_value",
    "flat_line",
    "extreme_change",
    "data_gap",
    "freq_infer",
    "storm_find",
    "spike_valley",
    "sessionize",
    "daily_rollup",
    "pricing_summary",
    "revenue_topn",
    "region_revenue",
    "top_customers_per_segment",
    "text_stats",
    "doc_fingerprint",
    "exact_dedup",
    "minhash_near_dup",
    "simhash_fingerprints",
    "knn_cosine",
    "embedding_norms",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from metevents_spark.session import get_spark
    from metevents_spark.queries import QUERIES

    spark = get_spark(app_name="metevents-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM, codegen, Arrow and parquet footer caches outside the
    # timed region with one representative query per engine path
    # (window+agg native; grouped-map pandas kernel)
    QUERIES["flat_line"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    QUERIES["storm_find"](spark, sf_dir).limit(1).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
