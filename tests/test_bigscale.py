"""Opt-in 10x endurance check (`pytest -m bigscale`): replicate sf0.1
tenfold into /tmp (tools/make_bigscale.py — fresh keys, disjoint
vocabularies, so it scales like a real sf1, not a duplication stress
test) and hash-check the FIVE heaviest oracle-backed queries from the
round-5 bench against DuckDB on the same parquet. Makes the README's
superlinearity story reproducible in-round instead of a one-off claim.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIG_DIR = "/tmp/metevents-sfbig-x10"

# heaviest oracle-backed queries by r05 warm bench time, plus the two
# round-7 oracle styles worth stressing at 10x: the hex byte-compare
# (media_resize — py-node output path) and the recursive-CTE replay
# (lttb_downsample — 10x more series through the 18-step recursion),
# plus the round-8 additions whose value claim IS scale behavior: the
# cross-corpus LSH join (incremental_dedup), the Bloom prefilter
# (decontaminate_bloom — 10x the gram stream through the probe), the
# one-pass covariance (10x embeddings through the Arrow partial-sum
# kernel vs the oracle's row x dim^2 expansion), the exact KS monitor
# (10x the distinct-value cumsum windows), and the shuffle-free
# entropy fold (10x documents through the sorted-run aggregate)
HEAVY = (
    "remove_duplicate_spans",
    "anomaly_consensus",
    "tfidf_top_terms",
    "gap_fill_hourly",
    "event_pair_lift",
    "media_resize",
    "lttb_downsample",
    "incremental_dedup",
    "decontaminate_bloom",
    "embedding_covariance",
    "ks_drift",
    "token_entropy",
    "nation_yoy_growth",
    "dominant_part_suppliers",
)


@pytest.mark.bigscale
def test_bigscale_heavy_oracle_hashes():
    import duckdb

    sys.path.insert(0, REPO)
    from tools.check_oracle import TABLES, frame_hash, normalize

    # build (cached: make_bigscale skips tables that already exist)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_bigscale.py"),
         "10", BIG_DIR],
        check=True,
        cwd=REPO,
    )

    import __spark_entry__ as entrymod
    from metevents_spark.session import get_spark

    spark = get_spark(app_name="bigscale", master="local[16]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{BIG_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in HEAVY:
        sdf = normalize(qs[name](spark, BIG_DIR).toPandas())
        ddf = normalize(con.sql(oracles[name]).df())
        assert len(sdf) == len(ddf), (name, len(sdf), len(ddf))
        assert sorted(sdf.columns) == sorted(ddf.columns), name
        assert frame_hash(sdf) == frame_hash(ddf), name
