"""Semantic pins for the round-9 operators against INDEPENDENT
replays (pandas/hashlib/itertools) — oracle equality is pinned
separately by tests/test_oracle_parity.py; these check the semantics
against a third implementation, not just Spark-vs-DuckDB agreement.
"""

from __future__ import annotations

import hashlib
import math
from itertools import combinations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL

K_KMV = 64
TWO60 = 1 << 60


def _h60(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def test_rolling_median_matches_pandas(spark):
    from metevents_spark.operators.seriesstats import rolling_median

    got = rolling_median(spark, SF_SMALL).toPandas()

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["sid"] = ev["user_id"].astype(str)
    ev = ev.sort_values(["sid", "ts", "event_id"], kind="stable")
    ev["med"] = (
        ev.groupby("sid")["value"]
        .rolling(7, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    ev = ev.sort_values(["sid", "ts", "event_id"]).reset_index(drop=True)
    got = got.sort_values(["sid", "ts", "seq"]).reset_index(drop=True)
    assert len(got) == len(ev)
    assert np.allclose(
        got["med7"].to_numpy(),
        np.round(ev["med"].to_numpy(), 6),
        atol=1e-9,
        equal_nan=True,
    )


def test_interval_coverage_matches_sweepline(spark):
    from metevents_spark.operators.intervals import interval_coverage

    got = interval_coverage(spark, SF_SMALL).toPandas().set_index("sid")

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["sid"] = ev["user_id"].astype(str)
    cover = 15 * 60 * 1_000_000
    for sid, grp in ev.groupby("sid"):
        grp = grp.sort_values(["ts", "event_id"], kind="stable")
        us = grp["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        islands = []
        cur_start, cur_stop = None, None
        for u in us:
            if cur_stop is None or u > cur_stop:
                if cur_stop is not None:
                    islands.append(cur_stop - cur_start)
                cur_start, cur_stop = u, u + cover
            else:
                cur_stop = max(cur_stop, u + cover)
        islands.append(cur_stop - cur_start)
        row = got.loc[sid]
        assert row["n_events"] == len(us)
        assert row["n_intervals"] == len(islands)
        assert row["covered_us"] == sum(islands)
        assert row["longest_us"] == max(islands)
        assert abs(row["covered_hours"] - round(sum(islands) / 3.6e9, 6)) < 1e-9


def test_weighted_sample_matches_independent_replay(spark):
    from metevents_spark.text.pipeline import weighted_sample

    got = weighted_sample(spark, SF_SMALL, n=100).toPandas()

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    keys = {
        int(r.doc_id): round(
            -math.log((_h60(int(r.doc_id)) + 1) / TWO60) / float(r.n_chars),
            12,
        )
        for r in docs.itertuples()
    }
    want = sorted(keys, key=lambda d: (keys[d], d))[:100]
    assert list(got["doc_id"]) == want
    assert np.allclose(
        got["sample_key"].to_numpy(), [keys[d] for d in want], atol=1e-11
    )
    # the whole point: big documents are over-represented vs uniform
    assert got["n_chars"].mean() > docs["n_chars"].mean()


def test_market_basket_lift_matches_bruteforce(spark):
    from metevents_spark.relational.basket import market_basket_lift

    got = market_basket_lift(spark, SF_SMALL).toPandas()

    line = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    items = line[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = items["l_orderkey"].nunique()
    item_n = items.groupby("l_partkey").size().to_dict()
    pair_n: dict = {}
    for _, grp in items.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["l_partkey"]), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    rows = []
    for (a, b), nab in pair_n.items():
        if nab < 3:
            continue
        na, nb = item_n[a], item_n[b]
        rows.append(
            (
                a, b, nab, na, nb,
                round(nab / n_orders, 6),
                round(nab / na, 6),
                round(nab * n_orders / (na * nb), 6),
            )
        )
    rows.sort(key=lambda r: (-r[7], r[0], r[1]))
    want = rows[:100]
    assert len(got) == len(want)
    for col_i, col in enumerate(
        ["part_a", "part_b", "n_ab", "n_a", "n_b",
         "support", "confidence", "lift"]
    ):
        gv = got[col].to_numpy()
        wv = np.array([r[col_i] for r in want])
        assert np.allclose(gv, wv, atol=1e-9), col


def test_user_reach_kmv_matches_direct_computation(spark):
    from metevents_spark.functions.sketches import user_reach_kmv

    got = user_reach_kmv(spark, SF_SMALL).toPandas()

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    for _, row in got.iterrows():
        users = ev.loc[ev["day"] == row["day"], "user_id"].unique()
        hs = sorted({_h60(int(u)) for u in users})
        assert row["n_exact"] == len(users)
        if len(hs) >= K_KMV:
            est = (K_KMV - 1) * float(TWO60) / (hs[K_KMV - 1] + 1)
        else:
            est = float(len(hs))
        assert abs(row["kmv_est"] - round(est, 4)) < 1e-9
        assert (
            abs(row["rel_err"] - round(abs(est - len(users)) / len(users), 4))
            < 1e-9
        )
    # sketch quality: with k=64 the typical relative error ~1/sqrt(62)
    # ~ 13%; assert a loose envelope so regressions in the hash or the
    # estimator show up
    assert got["rel_err"].median() < 0.35


def test_key_skew_report_matches_value_counts(spark):
    from metevents_spark.operators.skew import key_skew_report

    got = key_skew_report(spark, SF_SMALL).toPandas()

    line = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    counts = line.groupby("l_partkey").size()
    n_rows, n_keys = int(counts.sum()), int(len(counts))
    order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(got["key"]) == [k for k, _ in order]
    assert list(got["cnt"]) == [c for _, c in order]
    cum = np.cumsum([c for _, c in order])
    assert np.allclose(got["share"], [round(c / n_rows, 6) for _, c in order])
    assert np.allclose(got["cum_share"], np.round(cum / n_rows, 6))
    assert np.allclose(
        got["x_mean"],
        [round(c * n_keys / n_rows, 4) for _, c in order],
    )
    assert got["rank"].tolist() == list(range(1, len(got) + 1))
