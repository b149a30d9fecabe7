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
