"""Scan-multiplicity audit: for every registry query, count parquet
relations per table in the optimized plan and flag queries that scan
one table >= 3x — the signature of a re-derived subtree (DataFrame
reuse without a cache shares no subplan, so every extra consumer
re-runs the whole scan+transform pipeline). The r13 fourth-pickup
sweep found 13 flags this way; 7 were real (conversion_lag,
audience_overlap, mad_drift, unigram/bigram_logprob,
mann_whitney_u_bucketed, dedup_recall_report) and 6 were
InMemoryRelation echoes or by-design shapes.

Counts include InMemoryRelation cached-plan prints, so persisted
queries over-count: adjudicate flags against the executed plan (walk
without descending into InMemoryTableScan) before treating them as
defects.

Usage: python tools/scan_audit.py [sf_dir] [min_mult]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    min_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from metevents_spark.queries import QUERIES
    from metevents_spark.session import get_spark

    spark = get_spark(
        app_name="scan-audit", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as ex:  # surface, don't abort the sweep
            print(f"{name}: ERROR {ex}")
            continue
        tables = re.findall(r"Relation \[[^\]]*\] parquet", plan)
        # table identity via the relation's first column name
        firsts = [t.split("[")[1].split(",")[0].split("#")[0] for t in tables]
        c = Counter(firsts)
        mult = {k: v for k, v in c.items() if v >= min_mult}
        if mult:
            rows.append((name, dict(c), mult))

    rows.sort(key=lambda r: -max(r[2].values()))
    for name, allc, _ in rows:
        print(f"{name:32s} {allc}")
    print(f"\n{len(rows)} queries with a table scanned >= {min_mult}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
