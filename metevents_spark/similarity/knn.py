"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast join of the
(tiny) query set against the corpus with JVM-side dot products
(zip_with/aggregate — no Python, no UDF), then a per-query top-k window.
At 100 TB the corpus side stays partition-parallel; only the k results
per query shuffle.

The scale path is random-hyperplane LSH bucketing (knn_lsh): sign-bit
sketches computed JVM-side against broadcast hyperplanes; candidates
only form within a bucket.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metevents_spark.io import load_table


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(col):
    return F.sqrt(_dot(col, col))


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label norm statistics — sanity surface for the vector ops."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    return (
        emb.select("label", _norm(v).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


def knn_cosine(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 5
) -> DataFrame:
    """Exact cosine top-k of every corpus vector against the first
    ``n_queries`` vectors (self-matches excluded). Cosine is rounded to
    6 decimals *before* ranking so ordering is engine-deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id"), _as_double(F.col("embedding")).alias("v"),
        _norm(_as_double(F.col("embedding"))).alias("v_norm"),
    )
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        _as_double(F.col("embedding")).alias("q"),
        _norm(_as_double(F.col("embedding"))).alias("q_norm"),
    )
    sim = F.round(_dot(F.col("v"), F.col("q")) / (F.col("v_norm") * F.col("q_norm")), 6)
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def embedding_near_dup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label.

    The blocking key (here ``label``; in production a coarse cluster id
    or LSH bucket) keeps the pairwise join inside blocks, so the plan is
    a block-partitioned self-join — never an all-pairs product over the
    corpus. Cosine is computed JVM-side and rounded to 6 decimals before
    the threshold filter so both engines cut at the same value.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # norms are computed once per ROW here, not once per candidate pair
    # inside the join condition
    base = emb.select(
        "vec_id",
        "label",
        _as_double(F.col("embedding")).alias("v"),
        _norm(_as_double(F.col("embedding"))).alias("nrm"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def knn_ivf(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: a coarse quantizer of ``n_cells``
    centroids partitions the corpus into inverted lists; each query
    probes only its ``nprobe`` nearest cells and runs exact cosine there.

    Centroids are the first ``n_cells`` corpus vectors (deterministic
    stand-in for trained k-means — swap in MLlib KMeans centers for real
    data). Cell assignment is map-side only: centroids are embedded as
    array literals, and the argmax over per-centroid cosines is a pure
    column expression — no shuffle, no UDF. The only shuffles are the
    cell-key candidate join and the final per-query top-k.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding")
        .collect()
    ]
    cents.sort()

    def cent_lit(vec):
        arr = F.array(*[F.lit(x) for x in vec])
        return arr

    def cell_sims(vcol):
        # cosine of vcol against every centroid, as an array column
        return F.array(
            *[
                _dot(vcol, cent_lit(vec)) / (_norm(vcol) * _norm(cent_lit(vec)))
                for _, vec in cents
            ]
        )

    base = emb.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        _norm(_as_double(F.col("embedding"))).alias("v_norm"),
    )
    corpus_sims = cell_sims(F.col("v"))
    assigned = base.select(
        "vec_id", "v", "v_norm",
        (F.array_position(corpus_sims, F.array_max(corpus_sims)) - 1)
        .cast("int")
        .alias("cell"),
    )

    # queries probe their nprobe best cells: sort (sim, cell) structs desc
    probe_arr = F.slice(
        F.reverse(
            F.array_sort(
                F.zip_with(
                    cell_sims(F.col("q")),
                    F.array(*[F.lit(i) for i in range(len(cents))]),
                    lambda s, i: F.struct(s.alias("sim"), i.alias("cell")),
                )
            )
        ),
        1,
        nprobe,
    )
    queries = (
        base.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("q"),
            F.col("v_norm").alias("q_norm"),
        )
        .withColumn("probe", F.explode(probe_arr))
        .select("q_id", "q", "q_norm", F.col("probe.cell").alias("cell"))
    )

    sim = F.round(
        _dot(F.col("v"), F.col("q")) / (F.col("v_norm") * F.col("q_norm")), 6
    )
    scored = (
        assigned.join(F.broadcast(queries), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def knn_lsh(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 5,
    nbits: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH sketch (sign bits of
    projections onto ``nbits`` fixed hyperplanes), candidates restricted
    to the query's bucket. Deterministic hyperplanes from a seeded RNG,
    embedded as literals and evaluated JVM-side."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(nbits, dim)

    def sketch(vcol):
        code = F.lit(0).cast("long")
        for b in range(nbits):
            plane = F.array(*[F.lit(float(x)) for x in planes[b]])
            bit = F.when(_dot(vcol, plane) > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            code = code.bitwiseOR(F.shiftleft(bit, b))
        return code

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        _norm(_as_double(F.col("embedding"))).alias("v_norm"),
    ).withColumn("bucket", sketch(F.col("v")))
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q"),
        F.col("v_norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    sim = F.round(_dot(F.col("v"), F.col("q")) / (F.col("v_norm") * F.col("q_norm")), 6)
    scored = (
        base.join(F.broadcast(queries), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )
