"""Semantic dedup: full-pipeline differential against a numpy
reference (same deterministic seeding, same Lloyd rounds, same greedy
earliest-representative sweep), plus decision invariants."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from metevents_spark.similarity.semdedup import (
    kmeans_embeddings,
    semantic_dedup,
)

from tests.conftest import SF_SMALL

K, ITERS, THR = 8, 3, 0.35


def _norm(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def ref():
    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]

    # Lloyd with the same deterministic seed + empty-cluster rule
    cmat = m[ids < K][np.argsort(ids[ids < K])].copy()
    for _ in range(ITERS):
        cells = (_norm(m) @ _norm(cmat).T).argmax(axis=1)
        nxt = cmat.copy()
        for c in range(K):
            if (cells == c).any():
                nxt[c] = m[cells == c].mean(axis=0)
        cmat = nxt
    cells = (_norm(m) @ _norm(cmat).T).argmax(axis=1)

    # greedy earliest-representative sweep within each cluster
    dup_of = {}
    for c in range(K):
        cids = ids[cells == c]
        cm = _norm(m[cells == c])
        sims = np.round(cm @ cm.T, 6)
        for i in range(1, len(cids)):
            hits = np.flatnonzero(sims[i, :i] >= THR)
            if len(hits):
                dup_of[int(cids[i])] = (int(cids[hits[0]]), sims[i, hits[0]])
    return ids, dict(zip(ids.tolist(), cells.tolist())), dup_of


def test_differential_full_pipeline(spark, ref):
    ids, cells, dup_of = ref
    out = semantic_dedup(spark, SF_SMALL, k=K, iters=ITERS, threshold=THR).toPandas()
    assert len(out) == len(ids)
    got_cells = dict(zip(out["vec_id"], out["cluster"]))
    assert got_cells == cells
    got_dups = {
        int(r.vec_id): (int(r.dup_of), r.cos_to_dup)
        for r in out.itertuples()
        if not r.keep
    }
    assert set(got_dups) == set(dup_of)
    for v, (d, c) in dup_of.items():
        assert got_dups[v][0] == d
        assert abs(got_dups[v][1] - c) < 1e-9
    # sanity: the threshold actually fires on this corpus
    assert len(dup_of) > 0


def test_invariants(spark):
    out = semantic_dedup(spark, SF_SMALL, k=K, iters=ITERS, threshold=THR).toPandas()
    kept = out[out["keep"]]
    dropped = out[~out["keep"]]
    # every representative is itself kept... not guaranteed by greedy
    # earliest-rule (a rep may be a dup of an even earlier vec), but a
    # rep must always have a LOWER id than the item it replaces
    assert (dropped["dup_of"] < dropped["vec_id"]).all()
    assert dropped["cos_to_dup"].min() >= THR
    assert kept["dup_of"].isna().all()


def test_kmeans_report(spark):
    rep = kmeans_embeddings(spark, SF_SMALL, k=K, iters=ITERS).toPandas()
    assert rep["n_vecs"].sum() == 500
    assert (rep["mean_cohesion"] <= 1.0).all()
    assert (rep["mean_cohesion"] > 0.0).all()


def test_int_scores_exact_at_wrap_scale():
    """_int_scores must stay exact where int64 intermediates wrap
    (the r12 ADVICE fix): per-dim member sums of ~3e9 micro-units
    (a few thousand clustered members) overflow an int64 SQUARE, and
    big-sum × big-vi dot products overflow the int64 matmul. Both
    paths must equal arbitrary-precision Python-int arithmetic cast
    to double — the value DuckDB's HUGEINT arithmetic produces."""
    from metevents_spark.similarity.semdedup import _int_scores

    rng = np.random.RandomState(7)
    dim = 64
    # svec at wrap scale: |s_d| ~ 3.2e9 → s_d**2 ~ 1.0e19 > 2**63-1
    svec = (rng.randint(-32, 32, size=(4, dim)).astype(np.int64)
            * 100_000_000 + rng.randint(-1000, 1000, size=(4, dim)))
    assert int(np.abs(svec).max()) ** 2 > 2**63 - 1  # einsum WOULD wrap
    mi = rng.randint(-(10**6), 10**6, size=(5, dim)).astype(np.int64)

    got = _int_scores(mi, svec)
    exp_dots = [
        [sum(int(a) * int(b) for a, b in zip(v, s)) for s in svec]
        for v in mi
    ]
    exp_s2 = [sum(int(x) * int(x) for x in s) for s in svec]
    exp = np.array(
        [
            [float(d) / np.sqrt(float(q)) for d, q in zip(row, exp_s2)]
            for row in exp_dots
        ]
    )
    assert np.array_equal(got, exp)  # bit-identical, not just close
    assert np.isfinite(got).all()

    # and the object-dtype dot fallback: inflate mi so the matmul
    # bound dim*max|vi|*max|s| no longer fits in int64
    mi_big = mi * 10**6
    got_big = _int_scores(mi_big, svec)
    exp_big = np.array(
        [
            [
                float(sum(int(a) * int(b) for a, b in zip(v, s)))
                / np.sqrt(float(q))
                for s, q in zip(svec, exp_s2)
            ]
            for v in mi_big
        ]
    )
    assert np.array_equal(got_big, exp_big)


def test_quantize_units_matches_sql_round():
    """r12: half-away-from-zero parity with SQL ROUND(x*1e6) — the r11
    floor(s - 0.5) form shifted every negative non-half value one unit
    down, silently desyncing the 'engine-exact' training state from
    its DuckDB replay."""
    import duckdb

    from metevents_spark.similarity.semdedup import _quantize_units

    rng = np.random.RandomState(3)
    xs = np.concatenate(
        [
            rng.uniform(-1, 1, 200),
            [-0.1546943634748459, 0.0145, -0.0145, 0.5e-6, -0.5e-6, 0.0],
        ]
    )
    got = _quantize_units(xs.reshape(1, -1))[0]
    con = duckdb.connect()
    exp = [
        con.sql(
            f"SELECT CAST(ROUND(CAST({x!r} AS DOUBLE) * 1e6) AS BIGINT)"
        ).fetchone()[0]
        for x in xs
    ]
    assert got.tolist() == exp
