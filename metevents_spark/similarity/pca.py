"""Distributed covariance + PCA over the embedding column.

The similarity tier's statistics layer: the population covariance
matrix of the corpus embeddings (whitening, drift monitoring, and the
input to every spectral method) and PCA projection (dimensionality
reduction before clustering/ANN — SemDeDup and DSIR both run on
PCA-reduced vectors at scale).

Scale shape — the only one that survives 100 TB:
  * ONE ``mapInPandas`` pass computes per-Arrow-batch partial
    outer-product sums (X^T X, column sums, count) with a single BLAS
    matmul each; a batch of any size folds to dim*(dim+1)/2 + dim + 1
    numbers, so the shuffle moves O(partitions x dim^2) floats, never
    O(rows x dim^2) — the posexplode formulation (explode i, explode
    j, groupBy) would shuffle rows x dim^2 and die at scale.
  * The partials reduce with a dimension-sized groupBy; everything
    after (index mapping, the covariance formula) runs on dim^2 rows.
  * PCA additionally folds the dim x dim matrix on the driver and
    eigendecomposes it there — O(dim^3) on a CONSTANT-size matrix, the
    same legitimate tiny-collect as ``lloyd_centroids``' k x dim state
    (semdedup.py); the component matrix broadcasts back inside the
    projection kernel's closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metevents_spark.cache import track
from metevents_spark.io import load_table

PARTIAL_SCHEMA = "n long, sums array<double>, prods array<double>"


def _covariance_partials(emb: DataFrame, dim: int) -> DataFrame:
    """Per-partition (count, column-sum, upper-triangle X^T X) rows."""

    def partials(batches):
        s = np.zeros(dim)
        prods = np.zeros((dim, dim))
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            prods += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        if n:
            iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "n": [n],
                    "sums": [s.tolist()],
                    "prods": [prods[iu].tolist()],
                }
            )

    return emb.select("embedding").mapInPandas(partials, PARTIAL_SCHEMA)


INT_PARTIAL_SCHEMA = "n long, sums array<long>, prods array<long>"


def _covariance_partials_exact(emb: DataFrame, dim: int) -> DataFrame:
    """Per-Arrow-batch EXACT integer partials: embeddings quantize to a
    1e-6 grid (half-away-from-zero, matching SQL ROUND) and X^T X /
    column sums accumulate as int64 — order-independent, so the result
    is bit-identical under any partitioning / batching / engine.

    This is the random_projection pattern (knn.py): the float-sum
    nondeterminism that flipped ROUND(...,6) at ±5e-7 boundaries
    between the BLAS fold and a SQL per-row sum cannot occur in
    integer arithmetic. Overflow bound: |q| <= max|x|*1e6, so a batch
    of B rows bounds each prod cell by B*(max|x|*1e6)^2; per-batch
    emission keeps B at Arrow-batch size (<=10k), i.e. <=1e16 even for
    |x|=1 — far under int64. The cross-batch reduce then sums as
    DECIMAL(38,0), exact at any corpus size.
    """

    def partials(batches):
        iu = np.triu_indices(dim)
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1e6
            # half-away-from-zero, matching SQL ROUND (np.rint is half-even)
            q = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(
                np.int64
            )
            prods = q.T @ q  # exact int64 matmul
            yield pd.DataFrame(
                {
                    "n": [len(q)],
                    "sums": [q.sum(axis=0).tolist()],
                    "prods": [prods[iu].tolist()],
                }
            )

    return emb.select("embedding").mapInPandas(partials, INT_PARTIAL_SCHEMA)


def embedding_covariance(
    spark: SparkSession, sf_dir: str, dim: int = 64
) -> DataFrame:
    """Upper-triangle population covariance of the 1e-6-quantized
    embedding corpus: one row (i, j, cov) per dimension pair with
    i <= j, cov = E[x_i x_j] - E[x_i] E[x_j].

    Engine-exact: the moment sums are exact integers on the 1e-6 grid
    (see :func:`_covariance_partials_exact`), reduced with
    DECIMAL(38,0) sums; the only float ops are the final
    (sp - si*sj/n)/n / 1e12 with a fixed expression tree, identical
    IEEE in any engine — so the DuckDB oracle's per-row SQL fold and
    this kernel's batched integer matmul agree bit-for-bit.

    The partial rows reduce via posexplode + groupBy on the flat
    index (O(partitions x dim^2) rows — tiny), then a driver-built
    (pos -> i, j) mapping (dim^2 CONSTANT rows, broadcast) and the
    two column-sum joins assemble the formula. No driver collect in
    the plan itself.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # three consumers (prods, sums, count) — persist the partials so
    # the corpus scans once; partitions x dim^2 longs, trivially cached
    p = track(_covariance_partials_exact(emb, dim).persist())

    dec = "decimal(38,0)"
    sp = (
        p.select(F.posexplode("prods").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum(F.col("v").cast(dec)).cast("double").alias("sp"))
    )
    sums = (
        p.select(F.posexplode("sums").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum(F.col("v").cast(dec)).cast("double").alias("s"))
    )
    n_tot = p.groupBy().agg(F.sum("n").alias("n_tot"))

    iu_i, iu_j = np.triu_indices(dim)
    mapping = spark.createDataFrame(
        [(int(k), int(i), int(j)) for k, (i, j) in enumerate(zip(iu_i, iu_j))],
        "pos int, i int, j int",
    )
    si = sums.select(F.col("idx").alias("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("idx").alias("j"), F.col("s").alias("sj"))
    return (
        sp.join(F.broadcast(mapping), "pos")
        .join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "i",
            "j",
            F.round(
                (F.col("sp") - F.col("si") * F.col("sj") / F.col("n_tot"))
                / F.col("n_tot")
                / F.lit(1e12),
                6,
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def _principal_components(
    emb: DataFrame, dim: int, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """(mean vector, top-k components [k x dim], top-k eigenvalues,
    explained-variance ratios, count) from one distributed covariance
    pass + driver eigh.

    Sign convention: each component's largest-|coefficient| entry is
    made positive — eigenvectors are sign-ambiguous, this pins them
    deterministically.
    """
    rows = _covariance_partials(emb, dim).collect()
    if not rows:
        raise ValueError("empty embedding corpus")
    n = 0
    s = np.zeros(dim)
    tri = np.zeros(len(rows[0]["prods"]))
    for r in rows:
        n += r["n"]
        s += np.asarray(r["sums"])
        tri += np.asarray(r["prods"])
    iu = np.triu_indices(dim)
    prods = np.zeros((dim, dim))
    prods[iu] = tri
    prods = prods + prods.T - np.diag(np.diag(prods))
    mean = s / n
    cov = prods / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x dim
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    ratios = evals[order] / max(evals.sum(), 1e-300)
    return mean, comps, evals[order], ratios, n


def pca_embeddings(
    spark: SparkSession, sf_dir: str, k: int = 4, dim: int = 64
) -> DataFrame:
    """Project every embedding onto the corpus's top-``k`` principal
    axes: (vec_id, label, pc1..pck), centered, deterministic signs.

    Rows-only in the driver contract (eigendecomposition is not ANSI
    SQL); pinned by exact differential parity with an independent
    numpy PCA over the full sf0.001 corpus (tests/test_pca.py).
    Projection is map-side: the k x dim component matrix rides the
    kernel closure (broadcast), so the pass after training touches
    each row once and shuffles nothing but the final sort.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, _, _, _ = _principal_components(emb, dim, k)

    out_schema = "vec_id long, label int, " + ", ".join(
        f"pc{i + 1} double" for i in range(k)
    )

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = np.round((x - mean) @ comps.T, 6)
            out = {
                "vec_id": pdf["vec_id"].astype("int64"),
                "label": pdf["label"].astype("int32"),
            }
            for i in range(k):
                out[f"pc{i + 1}"] = proj[:, i]
            yield pd.DataFrame(out)

    return (
        emb.select("vec_id", "label", "embedding")
        .mapInPandas(project, out_schema)
        .orderBy("vec_id")
    )


def embedding_whitening(
    spark: SparkSession, sf_dir: str, k: int = 8, dim: int = 64
) -> DataFrame:
    """PCA-whitened embeddings: z = diag(1/sqrt(lambda_i)) V_k^T (x - mu)
    — the standard preconditioner before clustering/ANN when feature
    scales are anisotropic (whitened space makes Euclidean == Mahalanobis,
    so k-means stops being dominated by the high-variance axes).

    Same scale shape as :func:`pca_embeddings`: one distributed
    covariance pass, driver eigh on the CONSTANT dim x dim matrix, then
    a map-side Arrow kernel projects and rescales each row — nothing
    shuffles but the presentation sort. Rows-only in the driver
    contract; pinned by the defining invariant (the whitened corpus's
    own covariance equals the k x k identity) plus numpy differential
    parity (tests/test_pca.py).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, lam, _, _ = _principal_components(emb, dim, k)
    scale = 1.0 / np.sqrt(np.maximum(lam, 1e-12))  # k

    out_schema = "vec_id long, label int, " + ", ".join(
        f"w{i + 1} double" for i in range(k)
    )

    def whiten(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            z = np.round(((x - mean) @ comps.T) * scale, 6)
            out = {
                "vec_id": pdf["vec_id"].astype("int64"),
                "label": pdf["label"].astype("int32"),
            }
            for i in range(k):
                out[f"w{i + 1}"] = z[:, i]
            yield pd.DataFrame(out)

    return (
        emb.select("vec_id", "label", "embedding")
        .mapInPandas(whiten, out_schema)
        .orderBy("vec_id")
    )
