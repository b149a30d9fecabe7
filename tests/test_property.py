"""Property-based differential test: the gaps-and-islands detector
pipeline on random series must equal a direct Python transcription of
the reference semantics (condition -> consecutive runs -> min/max/sum).

Each hypothesis example packs many random series into ONE DataFrame
(one Spark job checks the whole batch), so coverage per second stays
high despite Spark's per-job overhead.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from metevents_spark.operators import extreme_value

EXPECTED_MAX, EXPECTED_MIN = 300.0, 0.0
START = datetime(2023, 1, 1)

values = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=-200, max_value=600, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=30,
)
series_batch = st.lists(values, min_size=1, max_size=8)


def brute_force(vals):
    """Reference semantics (events.py:333-358): out-of-range predicate,
    consecutive-True runs, per-run bounds + NaN-skipping total."""
    events = []
    run = []
    for i, v in enumerate(vals + [None]):
        cond = v is not None and (v > EXPECTED_MAX or v < EXPECTED_MIN)
        if cond:
            run.append((i, v))
        elif run:
            ts0 = START + timedelta(days=run[0][0])
            ts1 = START + timedelta(days=run[-1][0])
            events.append(
                (
                    ts0,
                    ts1,
                    int((ts1 - ts0).total_seconds() * 1_000_000),
                    len(run),
                    round(sum(v for _, v in run), 6),
                )
            )
            run = []
    return events


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=series_batch)
def test_extreme_value_matches_reference_semantics(spark, batch):
    rows = []
    for s, vals in enumerate(batch):
        for i, v in enumerate(vals):
            rows.append(
                (f"s{s}", i, START + timedelta(days=i), None if v is None else float(v))
            )
    df = spark.createDataFrame(
        rows, schema="sid string, seq long, ts timestamp, value double"
    )
    got = {}
    for r in extreme_value(df, EXPECTED_MAX, EXPECTED_MIN).collect():
        got.setdefault(r.sid, []).append(
            (r.start, r.stop, r.duration_us, r.n_points, round(r.total, 6))
        )
    for s, vals in enumerate(batch):
        expected = brute_force([None if v is None else float(v) for v in vals])
        assert got.get(f"s{s}", []) == expected, (s, vals)


# --- repetition fold: max-run aggregate vs a Counter reference ----------

docs_batch = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "aa", "x"]),
        min_size=2,
        max_size=40,
    ),
    min_size=1,
    max_size=10,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=docs_batch)
def test_repetition_fold_matches_counter(spark, batch, tmp_path_factory):
    """The zero-shuffle sorted-array fold in repetition_stats must equal
    the obvious Counter formulation for the top 2-gram count, on random
    token streams drawn from a tiny alphabet (maximally repetitive —
    the regime the fold's run-tracking must get right)."""
    from collections import Counter

    import pandas as pd

    from metevents_spark.text.stats import repetition_stats

    d = tmp_path_factory.mktemp("repdocs")
    pd.DataFrame(
        {
            "doc_id": range(len(batch)),
            "text": [" ".join(toks) for toks in batch],
            "lang": "en",
            "source": "src0",
            "n_chars": [len(" ".join(toks)) for toks in batch],
        }
    ).to_parquet(f"{d}/documents.parquet")

    got = {
        r.doc_id: (r.n_grams, r.top_gram_count)
        for r in repetition_stats(spark, str(d)).collect()
    }
    for i, toks in enumerate(batch):
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert got[i] == (len(grams), max(Counter(grams).values())), toks


# ---------------------------------------------------------------------------
# product analytics: funnel / rolling reach vs brute force


ts_int = st.integers(min_value=0, max_value=40)  # day offsets
user_ids = st.integers(min_value=0, max_value=5)
stage_idx = st.integers(min_value=0, max_value=3)

event_logs = st.lists(
    st.tuples(user_ids, stage_idx, ts_int), min_size=1, max_size=60
)

_STAGES = ("signup", "view", "click", "purchase")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=event_logs)
def test_funnel_matches_brute_force(spark, log):
    from metevents_spark.relational.product import funnel_frame

    rows = [
        (u, _STAGES[s], START + timedelta(days=t)) for u, s, t in log
    ]
    ev = spark.createDataFrame(
        rows, schema="user_id long, event_type string, ts timestamp"
    )
    got = {
        r.stage: r.n_users for r in funnel_frame(ev, _STAGES).collect()
    }

    # brute force: first-touch chain per user
    by_user: dict = {}
    for u, s, t in log:
        cur = by_user.setdefault(u, [None] * len(_STAGES))
        if cur[s] is None or t < cur[s]:
            cur[s] = t
    want = [0] * len(_STAGES)
    for firsts in by_user.values():
        q = firsts[0]
        if q is None:
            continue
        want[0] += 1
        for k in range(1, len(_STAGES)):
            if firsts[k] is not None and q is not None and firsts[k] >= q:
                q = firsts[k]
                want[k] += 1
            else:
                q = None
                break
    assert [got[i + 1] for i in range(len(_STAGES))] == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(st.tuples(user_ids, ts_int), min_size=1, max_size=60)
)
def test_rolling_active_matches_brute_force(spark, pairs):
    from metevents_spark.relational.product import rolling_active_frame

    rows = [(u, START + timedelta(days=t)) for u, t in pairs]
    ev = spark.createDataFrame(rows, schema="user_id long, ts timestamp")
    got = {
        r.day.date(): r.active_users
        for r in rolling_active_frame(ev, window_days=7).collect()
    }

    days = sorted({t for _, t in pairs})
    for d in days:
        active = {u for u, t in pairs if d - 6 <= t <= d}
        key = (START + timedelta(days=d)).date()
        assert got[key] == len(active), (d, active)
    assert len(got) == len(days)


@settings(max_examples=200, deadline=None)
@given(
    log=st.lists(
        st.tuples(st.sampled_from(_STAGES + ("error",)), ts_int),
        max_size=40,
    ),
    split=st.integers(min_value=0, max_value=40),
)
def test_stream_funnel_chunking_invariance(log, split):
    """Feeding a time-ordered log in ONE chunk or split at ANY boundary
    must produce identical emissions and final state — the property
    that makes the streaming funnel's multi-batch behavior equal its
    batch replay."""
    from metevents_spark.streaming import advance_funnel

    events = sorted(
        [(e, t * 1_000_000) for e, t in log], key=lambda r: r[1]
    )
    one, st_one = advance_funnel(None, events, _STAGES)
    k = min(split, len(events))
    first, st_mid = advance_funnel(None, events[:k], _STAGES)
    second, st_two = advance_funnel(st_mid, events[k:], _STAGES)
    assert one == first + second
    assert st_one == st_two


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=event_logs)
def test_transitions_match_brute_force(spark, log):
    from collections import Counter, defaultdict

    from metevents_spark.relational.product import transition_frame

    rows = [
        (u, i, _STAGES[s], START + timedelta(days=t))
        for i, (u, s, t) in enumerate(log)
    ]
    ev = spark.createDataFrame(
        rows,
        schema="user_id long, event_id long, event_type string,"
        " ts timestamp",
    )
    got = {
        (r.event_type, r.next_type): (r.n, r.p)
        for r in transition_frame(ev).collect()
    }

    seq = defaultdict(list)
    for u, i, s, t in rows:
        seq[u].append((t, i, s))
    counts: Counter = Counter()
    for evs in seq.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    assert set(got) == set(counts)
    row_tot: Counter = Counter()
    for (a, _), n in counts.items():
        row_tot[a] += n
    for key, n in counts.items():
        assert got[key][0] == n
        assert abs(got[key][1] - round(n / row_tot[key[0]], 5)) < 1e-9


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=event_logs)
def test_top_paths_match_brute_force(spark, log):
    from collections import Counter, defaultdict

    from metevents_spark.relational.product import path_frame

    rows = [
        (u, i, _STAGES[s], START + timedelta(days=t))
        for i, (u, s, t) in enumerate(log)
    ]
    ev = spark.createDataFrame(
        rows,
        schema="user_id long, event_id long, event_type string,"
        " ts timestamp",
    )
    got = [(r.rnk, r.path, r.n_users) for r in path_frame(ev).collect()]

    seq = defaultdict(list)
    for u, i, s, t in rows:
        seq[u].append((t, i, s))
    paths: Counter = Counter()
    for evs in seq.values():
        evs.sort()
        paths[">".join(s for _, _, s in evs[:3])] += 1
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == [(i + 1, p, n) for i, (p, n) in enumerate(want)]


# --- round-9 window algebra: rolling median + interval coverage ---------

r9_values = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=16),
    ),
    min_size=1,
    max_size=25,
)
r9_batch = st.lists(r9_values, min_size=1, max_size=6)

# random per-user event offsets in minutes — duplicates and bunching
# welcome (they exercise island merging and the dt=0 cases)
offsets = st.lists(
    st.integers(min_value=0, max_value=240), min_size=1, max_size=25
)
offsets_batch = st.lists(offsets, min_size=1, max_size=6)


def _events_dir(tmp_path_factory, rows):
    import pandas as pd

    d = tmp_path_factory.mktemp("r9ev")
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).to_parquet(f"{d}/events.parquet", coerce_timestamps="us")
    return str(d)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=r9_batch)
def test_rolling_median_matches_pandas_on_random_series(
    spark, batch, tmp_path_factory
):
    import numpy as np
    import pandas as pd

    from metevents_spark.operators.seriesstats import rolling_median

    rows = []
    eid = 0
    for s, vals in enumerate(batch):
        for i, v in enumerate(vals):
            rows.append(
                (eid, START + timedelta(hours=i), s, "t",
                 None if v is None else float(v))
            )
            eid += 1
    d = _events_dir(tmp_path_factory, rows)
    got = (
        rolling_median(spark, d)
        .toPandas()
        .sort_values(["sid", "ts", "seq"])
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "t", "v"])
    pdf["sid"] = pdf["user_id"].astype(str)
    pdf = pdf.sort_values(["sid", "ts", "event_id"]).reset_index(drop=True)
    want = (
        pdf.groupby("sid")["v"]
        .rolling(7, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    assert np.allclose(
        got["med7"].to_numpy(),
        np.round(want.to_numpy(), 6),
        atol=1e-9,
        equal_nan=True,
    ), batch


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=offsets_batch)
def test_interval_coverage_matches_sweepline_on_random_offsets(
    spark, batch, tmp_path_factory
):
    from metevents_spark.operators.intervals import interval_coverage

    cover_us = 15 * 60 * 1_000_000
    rows = []
    eid = 0
    for s, offs in enumerate(batch):
        for m in offs:
            rows.append(
                (eid, START + timedelta(minutes=m), s, "t", 1.0)
            )
            eid += 1
    d = _events_dir(tmp_path_factory, rows)
    got = {
        r.sid: (r.n_events, r.n_intervals, r.covered_us, r.longest_us)
        for r in interval_coverage(spark, d).collect()
    }
    for s, offs in enumerate(batch):
        import numpy as np

        us = sorted(
            int(np.datetime64(START + timedelta(minutes=m), "us").astype("int64"))
            for m in offs
        )
        islands = []
        cs, ce = None, None
        for u in us:
            if ce is None or u > ce:
                if ce is not None:
                    islands.append(ce - cs)
                cs, ce = u, u + cover_us
            else:
                ce = max(ce, u + cover_us)
        islands.append(ce - cs)
        assert got[str(s)] == (
            len(us), len(islands), sum(islands), max(islands)
        ), (s, offs)
