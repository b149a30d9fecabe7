"""SemDeDup-style semantic deduplication: k-means clustering over the
embedding corpus, then near-duplicate detection WITHIN clusters only.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication") clusters
embeddings with k-means and removes, inside each cluster, items whose
pairwise cosine exceeds a threshold — the cluster step bounds the
quadratic pair work exactly like the LSH band buckets bound MinHash:
pairwise cost scales with cluster size, never corpus size.

Spark shape:
  - Lloyd iterations: assignment is ONE numpy matmul per Arrow batch
    against the broadcast (k x dim) centroid matrix (pandas_udf, no
    shuffle); the M-step is the posexplode partial-aggregate trick
    (shuffle is O(partitions x k x dim), corpus-size independent) and
    collects only k x dim doubles to the driver per iteration — the
    same legitimate tiny-collect as knn_ivf's centroid fetch.
  - Dedup: one exchange on the final cluster id, a BLAS gram matrix
    per cluster inside applyInPandas (the embedding_near_dup kernel
    shape), and a greedy earliest-representative sweep that is
    deterministic in vec_id order.

At 100 TB: k grows to ~sqrt(corpus) so clusters stay bounded;
iterations are linear scans; the only driver state is k x dim floats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metevents_spark.io import load_table


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _assign_udf(cmat: np.ndarray):
    """Nearest-centroid (cosine) assignment, one matmul per batch."""
    cn = _normalize(cmat)

    @F.pandas_udf("int")
    def nearest(embs: pd.Series) -> pd.Series:
        m = _normalize(np.stack(embs.to_numpy()).astype(np.float64))
        return pd.Series((m @ cn.T).argmax(axis=1).astype(np.int32))

    return nearest


def lloyd_centroids(
    emb: DataFrame, k: int, iters: int
) -> np.ndarray:
    """Deterministic k-means: seeded by the k lowest-vec_id vectors,
    ``iters`` Lloyd rounds (cosine assignment, mean update). Returns
    the (k x dim) centroid matrix. Empty clusters keep their previous
    centroid (standard practice; deterministic)."""
    seeds = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    )
    cmat = np.array([v for _, v in seeds], dtype=np.float64)
    for _ in range(iters):
        assigned = emb.select(
            _assign_udf(cmat)("embedding").alias("cell"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "v"
            ),
        )
        rows = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("v").alias("c"))
            .collect()
        )
        nxt = cmat.copy()
        upd = {}
        for r in rows:
            upd.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["c"])
        for cell, d in upd.items():
            nxt[cell] = [d[p] for p in range(cmat.shape[1])]
        cmat = nxt
    return cmat


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.35,
) -> DataFrame:
    """Per-vector semantic-dedup decision: final cluster id, keep flag,
    and (for dropped items) the earliest near-duplicate it collapses
    into plus their cosine. Greedy earliest-representative rule: a
    vector is a duplicate of the LOWEST vec_id in its cluster whose
    cosine with it rounds to >= threshold — deterministic, and exactly
    reproducible by the numpy reference in tests/test_semdedup.py.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cmat = lloyd_centroids(emb, k, iters)
    assigned = emb.select(
        "vec_id", "embedding", _assign_udf(cmat)("embedding").alias("cluster")
    )
    out_schema = (
        "vec_id long, cluster int, keep boolean, dup_of long, cos_to_dup double"
    )

    def sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        sims = np.round(m @ m.T, 6)
        n = len(ids)
        dup_of = np.full(n, -1, dtype=np.int64)
        cos = np.full(n, np.nan)
        for i in range(1, n):
            hits = np.flatnonzero(sims[i, :i] >= threshold)
            if len(hits):
                j = int(hits[0])
                dup_of[i] = ids[j]
                cos[i] = sims[i, j]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"].to_numpy(),
                "keep": dup_of < 0,
                "dup_of": pd.array(
                    [None if d < 0 else int(d) for d in dup_of],
                    dtype="Int64",
                ),
                "cos_to_dup": cos,
            }
        )

    return (
        assigned.groupBy("cluster")
        .applyInPandas(sweep, out_schema)
        .orderBy("vec_id")
    )


def kmeans_embeddings(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """Cluster-profile report for the deterministic k-means: per
    cluster, member count and mean cosine to the centroid (cohesion).
    The assignment pass is map-side; the report is one tiny groupBy."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cmat = lloyd_centroids(emb, k, iters)
    cn = _normalize(cmat)

    @F.pandas_udf("double")
    def cos_to_centroid(embs: pd.Series) -> pd.Series:
        m = _normalize(np.stack(embs.to_numpy()).astype(np.float64))
        sims = m @ cn.T
        return pd.Series(sims.max(axis=1))

    assigned = emb.select(
        _assign_udf(cmat)("embedding").alias("cluster"),
        cos_to_centroid("embedding").alias("cos"),
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos"), 6).alias("mean_cohesion"),
        )
        .orderBy("cluster")
    )
