"""Independent-replay pins for the round-10 second-batch operators:
each op re-derived by hand in pandas/numpy (not by re-running the same
SQL) so a shared-oracle blind spot cannot hide a semantic bug.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def _events():
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["sid"] = ev["user_id"].astype(str)
    return ev


def _clean_series():
    ev = _events()
    ev = ev[ev["value"].notna() & ~np.isnan(ev["value"].astype(float))]
    return ev.sort_values(["sid", "ts", "event_id"])


def test_theilsen_matches_pandas_replay(spark):
    from metevents_spark.operators.rankstats import theilsen_trend

    got = theilsen_trend(spark, SF_SMALL).toPandas().set_index("sid")

    for sid, g in _clean_series().groupby("sid"):
        us = (
            g["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ).to_numpy()
        y = g["value"].to_numpy(dtype=float)
        i, j = np.triu_indices(len(y), k=1)
        keep = us[j] > us[i]
        slopes = (y[j][keep] - y[i][keep]) * 3.6e9 / (
            us[j][keep] - us[i][keep]
        ).astype(float)
        assert got.loc[sid, "n_pairs"] == len(slopes)
        assert abs(
            got.loc[sid, "theil_slope_per_hour"]
            - round(float(np.median(slopes)), 6)
        ) < 1e-9


def test_spearman_matches_pandas_replay(spark):
    from metevents_spark.operators.rankstats import spearman_trend

    got = spearman_trend(spark, SF_SMALL).toPandas().set_index("sid")
    assert got["spearman_rho"].abs().max() <= 1.0

    for sid, g in _clean_series().groupby("sid"):
        y = g["value"].to_numpy(dtype=float)
        x = np.arange(1, len(y) + 1, dtype=float)
        ry = pd.Series(y).rank(method="average").to_numpy()
        rho = np.corrcoef(x, ry)[0, 1]
        assert got.loc[sid, "n_points"] == len(y)
        assert abs(got.loc[sid, "spearman_rho"] - rho) < 1e-6


def test_mann_whitney_matches_scipy_formula(spark):
    from metevents_spark.operators.rankstats import mann_whitney_u

    got = mann_whitney_u(spark, SF_SMALL).toPandas().set_index("grp")
    ev = _events()
    ev = ev[ev["value"].notna()]

    base = ev[ev["event_type"] == "view"]["value"].to_numpy(dtype=float)
    for grp in got.index:
        a = ev[ev["event_type"] == grp]["value"].to_numpy(dtype=float)
        combined = np.concatenate([a, base])
        ranks = pd.Series(combined).rank(method="average").to_numpy()
        r_a = ranks[: len(a)].sum()
        n_a, n_b = len(a), len(base)
        u_a = r_a - n_a * (n_a + 1) / 2.0
        n = n_a + n_b
        _, t = np.unique(combined, return_counts=True)
        ties3 = float((t**3 - t).sum())
        sigma = np.sqrt(
            n_a * n_b / 12.0 * ((n + 1) - ties3 / (n * (n - 1)))
        )
        z = (u_a - n_a * n_b / 2.0) / sigma
        assert got.loc[grp, "n_a"] == n_a
        assert got.loc[grp, "n_b"] == n_b
        assert abs(got.loc[grp, "u_a"] - u_a) < 1e-9
        assert 0.0 <= got.loc[grp, "u_a"] <= n_a * n_b
        assert abs(got.loc[grp, "z"] - z) < 1e-6


def test_revenue_gini_matches_pandas_replay(spark):
    from metevents_spark.relational.tpch import revenue_gini

    got = revenue_gini(spark, SF_SMALL).toPandas().set_index("nation")
    assert ((got["gini"] >= 0) & (got["gini"] < 1)).all()

    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    nat = pd.read_parquet(f"{SF_SMALL}/nation.parquet")
    orders["cents"] = (orders["o_totalprice"] * 100).round().astype("int64")
    rev = orders.groupby("o_custkey")["cents"].sum().reset_index()
    j = rev.merge(
        cust[["c_custkey", "c_nationkey"]],
        left_on="o_custkey",
        right_on="c_custkey",
    ).merge(nat[["n_nationkey", "n_name"]], left_on="c_nationkey",
            right_on="n_nationkey")
    for nation, g in j.groupby("n_name"):
        x = np.sort(g["cents"].to_numpy())
        n, tot = len(x), x.sum()
        gini = (2.0 * (np.arange(1, n + 1) * x).sum() - (n + 1) * tot) / (
            n * tot
        )
        assert got.loc[nation, "n_customers"] == n
        assert abs(got.loc[nation, "gini"] - round(float(gini), 6)) < 1e-9


def test_conversion_lag_matches_pandas_replay(spark):
    from metevents_spark.relational.product import conversion_lag

    got = conversion_lag(spark, SF_SMALL).toPandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    s = ev[ev["event_type"] == "signup"].groupby("user_id")["ts"].min()
    conv = {}
    for uid, t0 in s.items():
        p = ev[
            (ev["event_type"] == "purchase")
            & (ev["user_id"] == uid)
            & (ev["ts"] >= t0)
        ]["ts"]
        if len(p):
            conv[uid] = (t0, p.min())
    assert set(got.index) == set(conv)
    for uid, (t0, t1) in conv.items():
        assert got.loc[uid, "signup_ts"] == t0
        assert got.loc[uid, "purchase_ts"] == t1
        assert got.loc[uid, "lag_us"] == (t1.value - t0.value) // 1000
        assert got.loc[uid, "lag_us"] >= 0


def test_triangles_match_set_replay(spark):
    from metevents_spark.operators.graph import copurchase_triangles

    got = copurchase_triangles(spark, SF_SMALL, top=30).toPandas()

    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    edges = set()
    for _, g in items.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"].unique())
        for a in range(len(ps)):
            for b in range(a + 1, len(ps)):
                edges.add((ps[a], ps[b]))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts: dict[int, int] = {}
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if w > v:  # u < v < w counts each triangle once
                for p in (u, v, w):
                    counts[p] = counts.get(p, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert list(map(tuple, got[["p_partkey", "n_triangles"]].values)) == want


def test_oov_rate_matches_counter_replay(spark):
    from collections import Counter

    from metevents_spark.text.stats import oov_rate

    got = oov_rate(spark, SF_SMALL).toPandas().set_index("source")

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    counts = Counter()
    for t in docs["text"]:
        counts.update(t.split(" "))
    vocab = set(
        tok
        for tok, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :25
        ]
    )
    for source, g in docs.groupby("source"):
        toks = [t for txt in g["text"] for t in txt.split(" ")]
        n_oov = sum(1 for t in toks if t not in vocab)
        assert got.loc[source, "n_tokens"] == len(toks)
        assert got.loc[source, "n_oov"] == n_oov
        assert abs(
            got.loc[source, "oov_rate"] - round(n_oov / len(toks), 6)
        ) < 1e-9
    # the k=25 vocab sits below the corpus's 31-token vocabulary, so
    # the rate must be non-degenerate (a top-500 vocab covered
    # everything and made every row 0)
    assert (got["n_oov"] > 0).any()


def test_survivor_pick_properties(spark):
    from metevents_spark.text.dedup import dedup_clusters, dedup_survivor_pick

    got = dedup_survivor_pick(spark, SF_SMALL).toPandas()
    clusters = dedup_clusters(spark, SF_SMALL).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet").set_index(
        "doc_id"
    )

    # cluster assignment is exactly dedup_clusters'
    assert (
        got.set_index("doc_id")["cluster"]
        .sort_index()
        .equals(clusters.set_index("doc_id")["cluster"].sort_index())
    )
    # exactly one survivor per cluster, and it's a member
    per = got.groupby("cluster")
    assert (per["is_survivor"].sum() == 1).all()
    for cluster, g in per:
        sid = g["survivor_id"].iloc[0]
        assert (g["survivor_id"] == sid).all()
        assert sid in set(g["doc_id"])
        # survivor maximizes (n_chars, -doc_id) over the cluster
        chars = docs.loc[g["doc_id"], "n_chars"]
        best = g["doc_id"].iloc[
            np.lexsort((g["doc_id"].values, -chars.values))[0]
        ]
        assert sid == best


def test_hard_negatives_match_numpy_replay(spark):
    from metevents_spark.similarity.knn import hard_negative_mining

    got = hard_negative_mining(spark, SF_SMALL).toPandas()

    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    vec_ids = emb["vec_id"].to_numpy()
    norms = np.linalg.norm(x, axis=1)
    for q_pos in np.where(vec_ids < 20)[0]:
        cos = np.round(
            x @ x[q_pos] / (norms * norms[q_pos]), 6
        )
        mask = labels != labels[q_pos]
        cand = sorted(
            zip(-cos[mask], vec_ids[mask])
        )[:5]
        sub = got[got["q_id"] == vec_ids[q_pos]].sort_values("rank")
        assert list(sub["vec_id"]) == [vid for _, vid in cand]
        assert np.allclose(sub["cosine"], [-c for c, _ in cand])
        # every mined negative really is cross-label
        assert (sub["neg_label"] != labels[q_pos]).all()


def test_kendall_matches_pandas_replay(spark):
    from metevents_spark.operators.rankstats import kendall_trend

    got = kendall_trend(spark, SF_SMALL).toPandas().set_index("sid")
    assert got["kendall_tau"].abs().max() <= 1.0

    for sid, g in _clean_series().groupby("sid"):
        y = g["value"].to_numpy(dtype=float)
        i, j = np.triu_indices(len(y), k=1)
        c = int((y[j] > y[i]).sum())
        d = int((y[j] < y[i]).sum())
        t = int((y[j] == y[i]).sum())
        n0 = len(i)
        tau = (c - d) / np.sqrt(float((n0 - t) * n0))
        assert got.loc[sid, "n_pairs"] == n0
        assert got.loc[sid, "concordant"] == c
        assert got.loc[sid, "discordant"] == d
        assert abs(got.loc[sid, "kendall_tau"] - round(float(tau), 6)) < 1e-9

    # cross-operator sanity: Kendall and Spearman must agree in SIGN
    # wherever both are decisive (pandas' corr(method="kendall") needs
    # scipy, absent here, so the sibling operator is the cross-check)
    from metevents_spark.operators.rankstats import spearman_trend

    rho = spearman_trend(spark, SF_SMALL).toPandas().set_index("sid")
    both = got.join(rho["spearman_rho"]).dropna()
    decisive = both[
        (both["kendall_tau"].abs() > 0.05)
        & (both["spearman_rho"].abs() > 0.05)
    ]
    assert len(decisive) > 0
    assert (
        np.sign(decisive["kendall_tau"])
        == np.sign(decisive["spearman_rho"])
    ).all()


def test_bootstrap_ci_matches_hashlib_replay(spark):
    import hashlib

    from metevents_spark.relational.product import conversion_bootstrap_ci

    got = conversion_bootstrap_ci(spark, SF_SMALL).toPandas().iloc[0]

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    s = ev[ev["event_type"] == "signup"].groupby("user_id")["ts"].min()
    conv = {}
    for uid, t0 in s.items():
        p = ev[
            (ev["event_type"] == "purchase")
            & (ev["user_id"] == uid)
            & (ev["ts"] >= t0)
            & (ev["ts"] <= t0 + pd.Timedelta(hours=24))
        ]
        conv[int(uid)] = 1 if len(p) else 0

    from metevents_spark.relational.product import _POISSON1_CUM60

    def pois(uid, rep):
        h60 = int(
            hashlib.md5(f"{uid}:{rep}".encode()).hexdigest()[:15], 16
        )
        for k, c in enumerate(_POISSON1_CUM60):
            if h60 < c:
                return k
        return 9

    rates = []
    for rep in range(200):
        num = den = 0
        for uid, c in conv.items():
            w = pois(uid, rep)
            num += w * c
            den += w
        rates.append(num / den)
    n = len(conv)
    n_conv = sum(conv.values())
    assert got["n_users"] == n
    assert got["n_converted"] == n_conv
    assert abs(got["p_hat"] - round(n_conv / n, 6)) < 1e-9
    lo, hi = np.percentile(rates, [2.5, 97.5], method="linear")
    assert abs(got["ci_lo"] - round(float(lo), 6)) < 1e-9
    assert abs(got["ci_hi"] - round(float(hi), 6)) < 1e-9
    # the interval brackets the point estimate; at sf0.001 every
    # signup user converts so the interval is legitimately [1, 1] —
    # non-degeneracy is only required when the outcome actually varies
    assert got["ci_lo"] <= got["p_hat"] <= got["ci_hi"]
    if 0 < n_conv < n:
        assert got["ci_lo"] < got["ci_hi"]


def test_audience_overlap_matches_set_replay(spark):
    from metevents_spark.relational.product import audience_overlap

    got = audience_overlap(spark, SF_SMALL).toPandas()
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    sets = {
        t: set(g["user_id"]) for t, g in ev.groupby("event_type")
    }
    types = sorted(sets)
    want = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            inter = len(sets[ta] & sets[tb])
            if inter:
                want.append(
                    (
                        ta,
                        tb,
                        len(sets[ta]),
                        len(sets[tb]),
                        inter,
                        round(inter / len(sets[ta] | sets[tb]), 6),
                    )
                )
    got_rows = [
        (
            r.type_a,
            r.type_b,
            r.n_a,
            r.n_b,
            r.n_both,
            round(r.jaccard, 6),
        )
        for r in got.itertuples()
    ]
    assert got_rows == want
    assert (got["jaccard"] <= 1.0).all() and (got["jaccard"] > 0).all()


def test_ship_delay_matches_pandas_replay(spark):
    from metevents_spark.relational.tpch import ship_delay_quantiles

    got = ship_delay_quantiles(spark, SF_SMALL).toPandas().set_index(
        "priority"
    )
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    day_us = 86_400_000_000
    delay_us = (
        j["l_shipdate"].astype("datetime64[ns]").astype("int64")
        - j["o_orderdate"].astype("datetime64[ns]").astype("int64")
    ) // 1000
    j = j.assign(delay_us=delay_us, delay_days=delay_us / day_us)
    for prio, g in j.groupby("o_orderpriority"):
        assert got.loc[prio, "n_lines"] == len(g)
        assert abs(
            got.loc[prio, "mean_days"]
            - round(g["delay_us"].sum() / len(g) / day_us, 6)
        ) < 1e-9
        for col, q in (("p50_days", 50), ("p90_days", 90), ("p99_days", 99)):
            want = np.percentile(
                g["delay_days"].to_numpy(), q, method="linear"
            )
            assert abs(got.loc[prio, col] - round(float(want), 6)) < 1e-9
        # sanity: percentiles ordered, delays non-negative
        assert (
            got.loc[prio, "p50_days"]
            <= got.loc[prio, "p90_days"]
            <= got.loc[prio, "p99_days"]
        )
        assert got.loc[prio, "p50_days"] >= 0


def test_bfs_hops_matches_set_replay(spark):
    from metevents_spark.operators.graph import copurchase_bfs_hops

    got = copurchase_bfs_hops(spark, SF_SMALL).toPandas()

    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    adj: dict[int, set[int]] = {}
    for _, g in items.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"].unique())
        for a in ps:
            for b in ps:
                if a != b:
                    adj.setdefault(a, set()).add(b)
    seed = sorted(adj, key=lambda p: (-len(adj[p]), p))[0]
    dist = {seed: 0}
    frontier = {seed}
    for h in (1, 2, 3):
        nxt = set()
        for u in frontier:
            nxt |= adj[u]
        nxt -= set(dist)
        for p in nxt:
            dist[p] = h
        frontier = nxt
    want = sorted((h, p) for p, h in dist.items())
    assert [(r.hops, r.p_partkey) for r in got.itertuples()] == want
    # the seed really is max-degree and hop counts are complete levels
    assert got["hops"].iloc[0] == 0
    assert set(got["hops"]) <= {0, 1, 2, 3}


def test_dedup_rate_by_source_matches_counter_replay(spark):
    import hashlib
    from collections import Counter

    from metevents_spark.text.dedup import dedup_rate_by_source

    got = dedup_rate_by_source(spark, SF_SMALL).toPandas().set_index(
        "source"
    )
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    digs = docs["text"].map(
        lambda t: hashlib.md5(t[:64].encode()).hexdigest()
    )
    corpus_counts = Counter(digs)
    docs = docs.assign(dup=digs.map(lambda d: corpus_counts[d] > 1))
    for source, g in docs.groupby("source"):
        assert got.loc[source, "n_docs"] == len(g)
        assert got.loc[source, "n_dup"] == int(g["dup"].sum())
        assert abs(
            got.loc[source, "dup_rate"]
            - round(g["dup"].sum() / len(g), 6)
        ) < 1e-9
    # duplicates exist in the synthetic corpus, so the readout is live
    assert (got["n_dup"] > 0).any()
