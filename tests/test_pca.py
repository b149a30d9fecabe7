"""Differential pins for the distributed covariance + PCA tier
(similarity/pca.py): the one-pass Arrow-kernel covariance must equal
numpy's full-matrix computation, and the PCA projection must match an
independent numpy PCA (same centering, same sign convention) on the
entire sf0.001 corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL

DIM = 64
K = 4


def _corpus() -> tuple[np.ndarray, pd.DataFrame]:
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    return x, emb


def _numpy_pca(x: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return mean, comps, evals[order]


def test_embedding_covariance_matches_numpy(spark):
    from metevents_spark.similarity.pca import embedding_covariance

    got = embedding_covariance(spark, SF_SMALL, dim=DIM).toPandas()
    x, _ = _corpus()
    ref = np.cov(x.T, bias=True)

    assert len(got) == DIM * (DIM + 1) // 2
    rebuilt = np.full((DIM, DIM), np.nan)
    rebuilt[got["i"], got["j"]] = got["cov"]
    iu = np.triu_indices(DIM)
    assert np.allclose(rebuilt[iu], ref[iu], atol=2e-6)


def test_embedding_covariance_partition_invariant(spark):
    """The r08 driver flake was accumulation-order float drift flipping
    ROUND(...,6) at a boundary; the integer-grid kernel is
    order-independent, so the rounded values must be BIT-IDENTICAL
    under any input partitioning — pin it by diffing a 1-partition
    run against a 32-partition run."""
    from metevents_spark.io import load_table
    from metevents_spark.similarity.pca import (
        _covariance_partials_exact,
        embedding_covariance,
    )

    base = embedding_covariance(spark, SF_SMALL, dim=DIM).toPandas()

    emb = load_table(spark, SF_SMALL, "embeddings")
    for n_parts in (1, 32):
        p = _covariance_partials_exact(emb.repartition(n_parts), DIM)
        # fold the exact integer partials on the driver and replay the
        # engine's float expression tree
        rows = p.collect()
        import numpy as np

        n = sum(r["n"] for r in rows)
        sums = np.sum([r["sums"] for r in rows], axis=0, dtype=object)
        prods = np.sum([r["prods"] for r in rows], axis=0, dtype=object)
        iu_i, iu_j = np.triu_indices(DIM)
        got = np.array(
            [
                round(
                    (float(sp) - float(sums[i]) * float(sums[j]) / n)
                    / n
                    / 1e12,
                    6,
                )
                for sp, i, j in zip(prods, iu_i, iu_j)
            ]
        )
        assert (got == base["cov"].to_numpy()).all(), n_parts


def test_pca_matches_numpy_reference(spark):
    from metevents_spark.similarity.pca import pca_embeddings

    got = pca_embeddings(spark, SF_SMALL, k=K, dim=DIM).toPandas()
    x, emb = _corpus()
    mean, comps, _ = _numpy_pca(x, K)
    proj = (x - mean) @ comps.T

    ref = pd.DataFrame(
        {"vec_id": emb["vec_id"].astype("int64")}
        | {f"pc{i + 1}": proj[:, i] for i in range(K)}
    ).sort_values("vec_id")
    got = got.sort_values("vec_id")
    assert (got["vec_id"].to_numpy() == ref["vec_id"].to_numpy()).all()
    for i in range(K):
        c = f"pc{i + 1}"
        assert np.allclose(got[c].to_numpy(), ref[c].to_numpy(), atol=1e-4), c
    # labels ride through untouched
    assert (
        got.set_index("vec_id")["label"]
        == emb.set_index("vec_id")["label"].astype("int32")
    ).all()


def test_pca_variance_structure(spark):
    from metevents_spark.similarity.pca import _principal_components
    from metevents_spark.io import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    mean, comps, evals_got, ratios, n = _principal_components(emb, DIM, K)

    x, _ = _corpus()
    assert n == len(x)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    # components are orthonormal, ratios sorted descending in (0, 1]
    assert np.allclose(comps @ comps.T, np.eye(K), atol=1e-9)
    assert (np.diff(ratios) <= 1e-12).all()
    assert 0 < ratios[-1] <= ratios[0] <= 1
    # the projection variance along axis i equals the i-th eigenvalue
    proj = (x - x.mean(axis=0)) @ comps.T
    _, _, evals = _numpy_pca(x, K)
    assert np.allclose(proj.var(axis=0), evals, rtol=1e-6)
    assert np.allclose(evals_got, evals, rtol=1e-9)


def test_embedding_whitening_identity_covariance(spark):
    """The defining invariant: the whitened corpus's own covariance is
    the k x k identity (variance 1 on every axis, zero cross-terms),
    and the values match a numpy whitening replay."""
    from metevents_spark.similarity.pca import embedding_whitening

    K8 = 8
    got = (
        embedding_whitening(spark, SF_SMALL, k=K8, dim=DIM)
        .toPandas()
        .sort_values("vec_id")
    )
    z = got[[f"w{i + 1}" for i in range(K8)]].to_numpy()
    cov = np.cov(z.T, bias=True)
    assert np.allclose(cov, np.eye(K8), atol=1e-4)

    x, emb = _corpus()
    mean = x.mean(axis=0)
    c = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(c)
    order = np.argsort(evals)[::-1][:K8]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(K8), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    ref = ((x - mean) @ comps.T) / np.sqrt(evals[order])
    ref_sorted = ref[np.argsort(emb["vec_id"].to_numpy())]
    assert np.allclose(z, ref_sorted, atol=1e-4)
