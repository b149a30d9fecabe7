"""Independent-replay pins for the round-10 operators: each op is
re-derived by hand in pandas (not by re-running the same SQL) so a
shared-oracle blind spot cannot hide a semantic bug.

events_above_type_avg (the salted-join demo) is pinned in
tests/test_skew.py next to the mechanism it exercises.
"""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMALL


def test_rrf_fusion_matches_pandas_replay(spark):
    from metevents_spark.text.stats import rrf_fusion

    got = rrf_fusion(spark, SF_SMALL).toPandas()

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    docs = docs.assign(
        n_tokens=docs["text"].str.split(" ").map(len)
    )
    r1 = (
        docs.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
        .assign(rank_chars=lambda d: d.index + 1)
        .set_index("doc_id")["rank_chars"]
    )
    r2 = (
        docs.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
        .assign(rank_tokens=lambda d: d.index + 1)
        .set_index("doc_id")["rank_tokens"]
    )
    ppm = (1_000_000 // (60 + r1)) + (1_000_000 // (60 + r2))
    want = (
        pd.DataFrame(
            {
                "doc_id": r1.index,
                "rank_chars": r1.values,
                "rank_tokens": r2.reindex(r1.index).values,
                "rrf_ppm": ppm.reindex(r1.index).values,
            }
        )
        .sort_values(["rrf_ppm", "doc_id"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["rrf_ppm"]) == list(want["rrf_ppm"])
    assert list(got["rank_chars"]) == list(want["rank_chars"])
    assert list(got["rank_tokens"]) == list(want["rank_tokens"])
    # fused top is not simply either input ranking
    assert (got["rank_chars"] != got["rank_tokens"]).any()


def test_chi2_terms_matches_counter_replay(spark):
    from collections import Counter

    from metevents_spark.text.stats import chi2_terms

    got = chi2_terms(spark, SF_SMALL).toPandas()

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    st: Counter = Counter()
    for source, text in zip(docs["source"], docs["text"]):
        for term in text.split(" "):
            st[(source, term)] += 1
    t_cnt: Counter = Counter()
    s_cnt: Counter = Counter()
    for (source, term), c in st.items():
        t_cnt[term] += c
        s_cnt[source] += c
    n_tot = sum(st.values())

    rows = []
    for (source, term), a in st.items():
        if a < 5:
            continue
        b = s_cnt[source] - a
        c = t_cnt[term] - a
        d = n_tot - s_cnt[source] - t_cnt[term] + a
        num = 1_000_000 * n_tot * (a * d - b * c) ** 2  # exact Python int
        den = (a + b) * (c + d) * (a + c) * (b + d)
        rows.append((source, term, a, num // den))
    want = pd.DataFrame(rows, columns=["source", "term", "a", "chi2_micro"])
    want = (
        want.sort_values(
            ["source", "chi2_micro", "term"],
            ascending=[True, False, True],
        )
        .groupby("source")
        .head(10)
        .reset_index(drop=True)
    )
    want["rank"] = want.groupby("source").cumcount() + 1

    got_k = got.set_index(["source", "rank"]).sort_index()
    want_k = want.set_index(["source", "rank"]).sort_index()
    assert list(got_k.index) == list(want_k.index)
    assert list(got_k["term"]) == list(want_k["term"])
    assert list(got_k["a"]) == list(want_k["a"])
    assert list(got_k["chi2_micro"]) == list(want_k["chi2_micro"])
    # a selected term is over-represented in its source: a/(a+b) > c/(c+d)
    # for the top-1 of every source (cross-multiplied, exact ints)
    for source in want["source"].unique():
        top = want[(want["source"] == source) & (want["rank"] == 1)].iloc[0]
        a = int(top["a"])
        b = s_cnt[source] - a
        c = t_cnt[top["term"]] - a
        d = n_tot - s_cnt[source] - t_cnt[top["term"]] + a
        assert a * (c + d) != c * (a + b)  # genuinely skewed association


def test_classifier_calibration_matches_python_replay(spark):
    from metevents_spark.quality import classifier_calibration

    got = classifier_calibration(spark, SF_SMALL).toPandas()

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    BUCKETS, MIX, WMOD = 4093, 2654435761, 1000003
    bins: dict[int, list[int]] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = text.split(" ")
        wsum = 0
        for x in toks:
            b = (len(x) * 131 + ord(x[0]) * 7919 + ord(x[-1]) * 104729) % BUCKETS
            wsum += (b * MIX) % WMOD
        prob_ppm = (wsum * 1_000_000) // (len(toks) * WMOD)
        bn = min(prob_ppm // 100_000, 9)
        n, pos, s = bins.get(bn, (0, 0, 0))
        bins[bn] = (n + 1, pos + (1 if lang == "en" else 0), s + prob_ppm)

    rows = []
    for bn in sorted(bins):
        n, pos, s = bins[bn]
        conf = s // n
        freq = (pos * 1_000_000) // n
        rows.append((bn, n, pos, conf, freq, abs(conf - freq)))
    tot_gap = sum(g * n for (_, n, _, _, _, g) in rows)
    tot_n = sum(n for (_, n, _, _, _, _) in rows)
    ece = tot_gap // tot_n

    assert list(got["bin"]) == [r[0] for r in rows]
    assert list(got["n_docs"]) == [r[1] for r in rows]
    assert list(got["n_pos"]) == [r[2] for r in rows]
    assert list(got["conf_ppm"]) == [r[3] for r in rows]
    assert list(got["freq_ppm"]) == [r[4] for r in rows]
    assert list(got["gap_ppm"]) == [r[5] for r in rows]
    assert (got["ece_ppm"] == ece).all()


def test_doc_containment_matches_set_replay(spark):
    """Independent pandas replay over raw shingle STRINGS (no md5) —
    catches digesting bugs as well as count/threshold bugs."""
    from metevents_spark.text.dedup import doc_containment

    got = doc_containment(spark, SF_SMALL).toPandas()

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    N, MAX_DF, MIN_SHARED, MIN_PPM = 5, 10, 3, 500_000
    sh: dict[int, set[str]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        t = text.split(" ")
        sh[int(doc_id)] = {
            " ".join(t[i : i + N]) for i in range(len(t) - N + 1)
        }
    from collections import Counter

    df_c: Counter = Counter()
    for s in sh.values():
        for g in s:
            df_c[g] += 1
    rare = {g for g, c in df_c.items() if c <= MAX_DF}
    want = []
    for a, sa in sh.items():
        ra = sa & rare
        for b, sb in sh.items():
            if a == b:
                continue
            shared = len(ra & sb & rare)
            if shared < MIN_SHARED:
                continue
            ppm = (shared * 1_000_000) // len(sa)
            if ppm >= MIN_PPM:
                want.append((a, b, shared, len(sa), ppm))
    want.sort()
    got_rows = sorted(
        map(
            tuple,
            got[["doc_a", "doc_b", "n_shared", "n_a", "containment_ppm"]]
            .astype("int64")
            .itertuples(index=False, name=None),
        )
    )
    assert got_rows == want
    assert want, "fixture should surface at least one containment pair"


def test_part_pagerank_matches_numpy_power_iteration(spark):
    """Independent dense power-iteration replay of the full sf0.001
    co-purchase graph; Spark's distributed float folds may differ in
    ulps, so values compare at a 2-ppm tolerance."""
    import numpy as np

    from metevents_spark.operators.graph import part_pagerank

    got = part_pagerank(spark, SF_SMALL).toPandas()

    line = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    from collections import Counter

    w: Counter = Counter()
    for _, grp in line.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].unique())
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                w[(parts[i], parts[j])] += 1
    nodes = sorted({p for pair in w for p in pair})
    idx = {p: i for i, p in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for (a, b), c in w.items():
        W[idx[a], idx[b]] += c
        W[idx[b], idx[a]] += c
    P = W / W.sum(axis=1, keepdims=True)  # row-stochastic
    rank = np.ones(n)
    for _ in range(12):
        rank = 0.15 + 0.85 * (P.T @ rank)
    want_ppm = {p: round(rank[idx[p]] * 1e6) for p in nodes}

    # ranks sum to ~n (the mean-rank-1 convention) and respect the
    # uniform-teleport floor
    assert abs(rank.sum() - n) < 1e-6 * n
    assert (rank >= 0.15 - 1e-12).all()

    assert len(got) == 50
    assert list(got["rank_ppm"]) == sorted(got["rank_ppm"], reverse=True)
    for pid, ppm in zip(got["pid"], got["rank_ppm"]):
        assert abs(ppm - want_ppm[int(pid)]) <= 2, (pid, ppm, want_ppm[int(pid)])


def test_purchase_attribution_matches_sequential_replay(spark):
    """Per-user sequential replay: walk each user's events in (ts,
    event_id) order carrying the last non-purchase touch, emit one row
    per purchase with the 7-day window test — the IGNORE-NULLS window
    re-derived imperatively."""
    import numpy as np

    from metevents_spark.relational.product import purchase_attribution

    got = purchase_attribution(spark, SF_SMALL).toPandas()

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    LB = 7 * 86_400_000_000
    want = []
    for _, grp in ev.groupby("user_id"):
        touch = None
        for r in grp.sort_values(["ts_us", "event_id"]).itertuples():
            if r.event_type == "purchase":
                if touch is not None and r.ts_us - touch[0] <= LB:
                    want.append(
                        (r.event_id, touch[1], touch[2], r.ts_us - touch[0])
                    )
                else:
                    want.append((r.event_id, None, None, None))
            else:
                touch = (r.ts_us, r.event_id, r.event_type)
    want.sort()

    assert len(got) == len(want)
    for row, (pid, tid, ttype, gap) in zip(
        got.sort_values("purchase_id").itertuples(), want
    ):
        assert row.purchase_id == pid
        if tid is None:
            assert pd.isna(row.touch_id) and pd.isna(row.gap_us)
        else:
            assert row.touch_id == tid and row.touch_type == ttype
            assert row.gap_us == gap
    # the fixture should actually attribute something
    assert got["touch_id"].notna().any()


def test_model_select_backtest_matches_sequential_replay(spark):
    import math

    from metevents_spark.operators.seriesstats import model_select_backtest

    got = (
        model_select_backtest(spark, SF_SMALL)
        .toPandas()
        .set_index("sid")
    )

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["sid"] = ev["user_id"].astype(str)
    a, b_ = 0.2, 0.1
    for sid, grp in ev.groupby("sid"):
        grp = grp.sort_values(["ts", "event_id"], kind="stable")
        s = l = b = None
        n, abs_e, abs_h = 0, 0, 0
        for x in grp["value"]:
            if pd.isna(x):
                continue
            x = float(x)
            if l is None:
                s, l, b = x, x, 0.0
                continue
            n += 1
            for fc, is_e in ((s, True), (l + b, False)):
                v = (x - fc) * 1e6
                e = int(math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5))
                if is_e:
                    abs_e += abs(e)
                else:
                    abs_h += abs(e)
            s = a * x + (1 - a) * s
            prev = l
            l = a * x + (1 - a) * (l + b)
            b = b_ * (l - prev) + (1 - b_) * b
        row = got.loc[sid]
        assert row["n_forecasts"] == n
        assert abs(row["mae_ewma"] - math.floor(abs_e / n + 0.5) / 1e6) < 1e-12
        assert abs(row["mae_holt"] - math.floor(abs_h / n + 0.5) / 1e6) < 1e-12
        assert row["champion"] == ("ewma" if abs_e <= abs_h else "holt")
    # champion column is consistent with the reported MAEs up to the
    # 1e-6 quantization (strictly better MAE implies the crown)
    worse = got[got["mae_ewma"] > got["mae_holt"] + 1e-9]
    assert (worse["champion"] == "holt").all()


def test_ab_test_report_matches_statsmodel_replay(spark):
    import math

    from metevents_spark.relational.product import ab_test_report

    got = ab_test_report(spark, SF_SMALL).toPandas().iloc[0]

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    pc = (
        ev[ev["event_type"] == "purchase"]
        .groupby("user_id")
        .size()
        .reindex(ev["user_id"].unique(), fill_value=0)
    )
    conv = (pc >= 14).astype(int)
    arm = pd.Series(pc.index % 2, index=pc.index)
    n0, n1 = int((arm == 0).sum()), int((arm == 1).sum())
    c0, c1 = int(conv[arm == 0].sum()), int(conv[arm == 1].sum())

    assert got["n_control"] == n0 and got["n_treatment"] == n1
    assert got["conv_control"] == c0 and got["conv_treatment"] == c1
    assert got["rate_control_ppm"] == c0 * 1_000_000 // n0
    assert got["rate_treatment_ppm"] == c1 * 1_000_000 // n1
    if c0 == 0:
        assert pd.isna(got["lift_ppm"])
    else:
        num = c1 * n0 - c0 * n1
        den = c0 * n1
        want_lift = (
            num * 1_000_000 // den
            if num >= 0
            else -((-num) * 1_000_000 // den)
        )
        assert got["lift_ppm"] == want_lift
    if 0 < c0 + c1 < n0 + n1:
        pool = (c0 + c1) / (n0 + n1)
        z = (c1 / n1 - c0 / n0) / math.sqrt(
            pool * (1 - pool) * (1 / n0 + 1 / n1)
        )
        assert abs(got["z_score"] - round(z, 6)) < 2e-6
    else:
        assert pd.isna(got["z_score"])


def test_part_pagerank_convergence_exit(spark, tmp_path):
    """r11: the convergence exit. (a) On the real sf0.001 graph the
    default tol=0.0 never fires inside the 12-round cap (no exact
    fixed point) — output stays the fixed-round contract; (b) a huge
    tol exits after one round; (c) on a 2-regular cycle graph the
    uniform distribution IS the exact fixed point (teleport + damping
    complement exactly: Sterbenz), so tol=0.0 exits after round 1 with
    every rank at exactly 1.0 — r14 batches the tol=0 convergence
    check every 3rd round (identity rounds past the fixed point, so
    output is bit-identical), hence last_n_rounds lands on 3."""
    from metevents_spark.operators.graph import part_pagerank

    part_pagerank(spark, SF_SMALL)
    assert part_pagerank.last_n_rounds == 12

    # tol > 0: overshoot would change output, so the check stays
    # per-round and a huge tol still exits after exactly one round
    part_pagerank(spark, SF_SMALL, tol=1e9)
    assert part_pagerank.last_n_rounds == 1

    # cycle graph: orders are consecutive part pairs (1,2)..(6,1)
    parts = [1, 2, 3, 4, 5, 6]
    rows = []
    for ok, (a, b) in enumerate(zip(parts, parts[1:] + parts[:1])):
        rows += [(ok, a), (ok, b)]
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = part_pagerank(spark, str(tmp_path)).toPandas()
    # fixed point is reached at round 1; the batched tol=0 check fires
    # at round 3 after two identity rounds (ranks unchanged)
    assert part_pagerank.last_n_rounds == 3
    assert sorted(got["pid"]) == parts
    assert (got["rank_ppm"] == 1_000_000).all()
