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
# ... and the round-9 additions: the two dedup operators whose scale
# story (banded LSH buckets, iterative connected components) most
# needs empirical confirmation at 10x
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
    "minhash_near_dup",
    "dedup_clusters",
    # r9 additions whose value claim IS scale behavior: the 1M-row
    # rolling-median window output, the Holt recursion replayed over
    # 10x series, the global-sort quantile normalization, and the
    # basket self-join over 10x orders
    "rolling_median",
    "holt_backtest",
    "score_percentile_by_source",
    "market_basket_lift",
    # r10 additions: the posting-cap containment join (10x documents
    # through the inverted-index self-join — the max_df bound is the
    # scale claim), the hot-key salted join over 10x events, and the
    # all-integer chi2 contingency build over 10x the token stream
    "doc_containment",
    "events_above_type_avg",
    "chi2_terms",
    # r10 batch 2: the per-series O(n^2) pair self-join (10x series,
    # co-located — pair count must scale linearly with series count)
    # and the wedge-join triangle count (10x disjoint graph copies —
    # the broadcast closing-edge probe at 10x the wedge stream)
    "theilsen_trend",
    "copurchase_triangles",
    # r12 additions whose value claim IS scale behavior: the
    # density-adaptive grid-LSH (auto n_projections must hold the
    # in-cell gram work linear at 10x — the r11 sf1 watch item), the
    # bucketed Mann-Whitney (the designated large-n path, now with
    # the decimal ties^3 fold), and the integer-Lloyd dedup whose
    # widened score arithmetic exists FOR clustered-corpus scale
    "media_embedding_near_dup",
    "mann_whitney_u_bucketed",
    "semantic_dedup",
    # r12 batch 2: BPE training/encode upgraded to full SQL oracles —
    # at 10x the vocab the chained-CTE replay exercises the argmax
    # tie-break and the recursive encode over a corpus-fresh merge
    # table (disjoint vocabularies mean genuinely different merges)
    "bpe_learn",
    "bpe_token_count",
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


@pytest.mark.bigscale
def test_bigscale_hot_bucket_cap_triggers_at_default(tmp_path_factory):
    """The DEFAULT HOT_BUCKET_CAP (1000) must actually fire at scale:
    plant a 1200-document near-identical boilerplate block into the 10x
    corpus and assert (a) the guard records the over-cap bucket, (b)
    the query completes without the quadratic bucket self-join, and
    (c) pairs among the ORGANIC documents are byte-identical to a run
    without the planted block — the cap only sheds the pathological
    bucket, never organic recall."""
    import pandas as pd

    sys.path.insert(0, REPO)
    from metevents_spark.session import get_spark
    from metevents_spark.text.dedup import (
        HOT_BUCKET_CAP,
        LAST_GUARD_METRICS,
        minhash_near_dup,
    )

    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_bigscale.py"),
         "10", BIG_DIR],
        check=True,
        cwd=REPO,
    )

    spark = get_spark(app_name="bigscale-hotbucket", master="local[16]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    n_hot = HOT_BUCKET_CAP + 200
    docs = pd.read_parquet(f"{BIG_DIR}/documents.parquet")
    base_id = int(docs["doc_id"].max()) + 1
    boiler = " ".join(f"tok{i % 7}" for i in range(60))
    planted = pd.DataFrame(
        {
            "doc_id": [base_id + i for i in range(n_hot)],
            "text": [f"{boiler} unique{i}" for i in range(n_hot)],
        }
    )
    for c in docs.columns:
        if c not in planted.columns:
            planted[c] = docs[c].iloc[0]
    planted = planted[docs.columns]

    d = tmp_path_factory.mktemp("hotbig")
    pd.concat([docs, planted], ignore_index=True).to_parquet(
        str(d / "documents.parquet")
    )

    organic = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_dup(spark, BIG_DIR).collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_dup(spark, str(d)).collect()
    }
    dropped = LAST_GUARD_METRICS["minhash_lsh_guard"]["dropped_buckets"]
    rows = dropped.collect()
    # the guard fired on the planted block (a few of the 1200 planted
    # docs land in different buckets per band — the unique trailing
    # token perturbs edge shingles — so the hot bucket holds slightly
    # fewer than n_hot)
    assert rows and max(r.bsz for r in rows) > HOT_BUCKET_CAP
    # the quadratic bucket self-join was avoided: pairs touching the
    # planted block are at most the few stragglers outside the shed
    # bucket, orders of magnitude below the ~720k uncapped pairs
    planted_ids = {base_id + i for i in range(n_hot)}
    planted_pairs = [
        (a, b) for a, b in got if a in planted_ids or b in planted_ids
    ]
    assert len(planted_pairs) < n_hot * (n_hot - 1) // 2 * 0.01
    # pairs among ORGANIC documents are byte-identical to the run
    # without the planted block
    organic_got = {
        (a, b)
        for a, b in got
        if a not in planted_ids and b not in planted_ids
    }
    assert organic_got == organic
