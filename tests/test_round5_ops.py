"""Invariant tests for the round-5 operators — semantic properties the
oracle hash can't articulate (the hash proves equality with DuckDB;
these prove both engines compute the thing the docstring promises)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL


def test_seasonal_decompose_exact_identity(spark):
    """The decomposition is EXACT in integer micro-units:
    round(value*1e6) == trend*1e6 + seasonal*1e6 + resid*1e6, row for
    row — no floating residue, by construction."""
    from metevents_spark.operators.seriesstats import seasonal_decompose

    out = seasonal_decompose(spark, SF_SMALL).toPandas()
    vu = np.round(out["value"].to_numpy() * 1e6).astype(np.int64)
    tu = np.round(out["trend"].to_numpy() * 1e6).astype(np.int64)
    su = np.round(out["seasonal"].to_numpy() * 1e6).astype(np.int64)
    ru = np.round(out["resid"].to_numpy() * 1e6).astype(np.int64)
    assert (vu == tu + su + ru).all()
    # seasonal is constant within each (sid, hour) stratum
    hod = pd.to_datetime(out["ts"]).dt.hour
    assert (
        out.assign(h=hod).groupby(["sid", "h"])["seasonal"].nunique() == 1
    ).all()


def test_classifier_score_bounds_and_gate(spark):
    from metevents_spark.text import classifier_score

    out = classifier_score(spark, SF_SMALL).toPandas()
    assert out["margin"].between(-0.5, 0.5).all()
    assert (out["keep"] == (out["margin"] > 0)).all()
    assert out["n_tokens"].gt(0).all()
    # the gate discriminates (not all-pass / all-fail) on real text
    assert 0 < out["keep"].sum() < len(out)


def test_series_acf_range(spark):
    from metevents_spark.operators.seriesstats import series_acf

    out = series_acf(spark, SF_SMALL).toPandas()
    for c in ["acf_lag1", "acf_lag2", "acf_lag3"]:
        vals = out[c].dropna()
        assert vals.between(-1.0, 1.0).all()
    assert (out["n_points"] > 3).all()


def test_bpe_pair_counts_shape(spark):
    from metevents_spark.text import bpe_pair_counts

    out = bpe_pair_counts(spark, SF_SMALL).toPandas()
    assert (out["pair"].str.len() == 2).all()
    assert (out["n"].diff().dropna() <= 0).all()  # count-descending
    assert len(out) == 50


def test_min_cost_supplier_is_partition_min(spark):
    """Differential vs a pandas recomputation of the rank-1 rule."""
    from metevents_spark.relational.tpch import min_cost_supplier

    out = min_cost_supplier(spark, SF_SMALL).toPandas()
    line = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMALL}/part.parquet")
    promo = part[part["p_type"] == "PROMO"][["p_partkey"]]
    j = line.merge(promo, left_on="l_partkey", right_on="p_partkey")
    j["unit_price"] = (j["l_extendedprice"] / j["l_quantity"]).round(6)
    best = (
        j.sort_values(["unit_price", "l_suppkey"])
        .groupby("l_partkey")
        .first()
        .reset_index()
    )
    exp = best.set_index("l_partkey")["unit_price"].to_dict()
    got = out.set_index("p_partkey")["unit_price"].to_dict()
    assert got == exp


def test_latest_event_per_user_matches_pandas(spark):
    from metevents_spark.relational import latest_event_per_user

    out = latest_event_per_user(spark, SF_SMALL).toPandas()
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    last = (
        ev.sort_values(["ts", "event_id"])
        .groupby("user_id")
        .last()
        .reset_index()
    )
    assert len(out) == len(last)
    m = out.merge(last, on="user_id", suffixes=("", "_exp"))
    assert (m["last_seq"] == m["event_id"]).all()
    assert (m["last_type"] == m["event_type"]).all()


def test_important_parts_share_sums_below_one(spark):
    from metevents_spark.relational.tpch import important_parts

    out = important_parts(spark, SF_SMALL).toPandas()
    assert out["value_share"].gt(1.0 / 2000.0).all()
    # shares are rounded to 8 decimals, so the sum can exceed 1 by at
    # most half an ulp of that rounding per row
    assert out["value_share"].sum() <= 1.0 + 0.5e-8 * len(out)


def test_bm25_rank_invariants(spark):
    """Every ranked doc contains at least one query term, ranks are
    dense from 1 in score order, and a doc matching MORE query terms
    with the same lengths outranks a single-term doc (BM25 term sums
    are monotone in matched-term count)."""
    from metevents_spark.io import load_table
    from metevents_spark.text import bm25_rank
    from metevents_spark.text.stats import BM25_QUERIES

    out = bm25_rank(spark, SF_SMALL).toPandas()
    docs = load_table(spark, SF_SMALL, "documents").toPandas()
    text = dict(zip(docs["doc_id"], docs["text"]))
    terms = {qid: set(ts) for qid, ts in BM25_QUERIES}
    for qid, grp in out.groupby("q_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        scores = grp["score"].to_numpy()
        assert (scores[:-1] >= scores[1:]).all()
        for doc_id in grp["doc_id"]:
            assert terms[qid] & set(text[doc_id].split(" ")), (qid, doc_id)


def test_bm25_more_matched_terms_outranks(spark, tmp_path):
    """Controlled fixture for the BM25 monotonicity claim: with equal
    document lengths and per-term tf=1, a doc matching TWO of q1's
    query terms must outrank a doc matching one (idf is strictly
    positive, so the term sum is monotone in matched-term count)."""
    from metevents_spark.text import bm25_rank

    # all docs length 8 (dl/avgdl == 1 for every doc); filler tokens
    # never collide with BM25_QUERIES terms
    rows = [
        (1, "window agg f1 f2 f3 f4 f5 f6"),   # 2 terms of q1
        (2, "window g1 g2 g3 g4 g5 g6 g7"),    # 1 term of q1
        (3, "h1 h2 h3 h4 h5 h6 h7 h8"),
        (4, "i1 i2 i3 i4 i5 i6 i7 i8"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    out = bm25_rank(spark, str(tmp_path)).toPandas()
    q1 = out[out["q_id"] == "q1"].set_index("doc_id")
    assert q1.loc[1, "score"] > q1.loc[2, "score"]
    assert q1.loc[1, "rank"] == 1 and q1.loc[2, "rank"] == 2
