"""Deduplication operators: exact, prefix, MinHash-LSH, SimHash.

Scale design: everything is hash-groupBy / hash-join shaped — no
pairwise O(n^2) comparison ever materializes over the full corpus.
MinHash-LSH banding means candidate pairs only form within tiny LSH
buckets; at 100 TB the band-bucket groupBy shuffles fingerprints
(~100 bytes/doc), not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metevents_spark.io import load_table


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by full-content hash; keeper = min doc_id.
    (hash-groupBy; the content itself never shuffles, only the digest)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_id")
    )


def prefix_dedup(spark: SparkSession, sf_dir: str, prefix_len: int = 64) -> DataFrame:
    """Near-dup by shared content prefix (cheap first-pass bucketing)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.md5(F.substring("text", 1, prefix_len)).alias("prefix_hash")
        )
        .groupBy("prefix_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("keep_id")
    )


def _shingles(k: int):
    """Distinct k-token shingles as an array column (JVM-side)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size(split(text, ' ')) - {k - 1}, 1)),"
            f" i -> array_join(slice(split(text, ' '), i, {k}), ' '))"
        )
    )


def minhash_signatures(
    docs: DataFrame, k: int = 3, num_hashes: int = 32
) -> DataFrame:
    """-> (doc_id, sig: array<long>) MinHash signature per document.

    Hash family: xxhash64(shingle, seed_i) — JVM built-in, no UDF. The
    explode/groupBy computes all ``num_hashes`` minima in one shuffle
    of (doc_id, shingle-hash) pairs.
    """
    sh = docs.select("doc_id", F.explode(_shingles(k)).alias("shingle"))
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_near_dup(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs.

    shingle -> minhash signature -> band buckets -> bucket self-join ->
    estimated Jaccard (fraction of agreeing minhashes) >= threshold.
    Banding with r = num_hashes/bands rows makes the S-curve cutoff
    ~ (1/bands)^(1/r).
    """
    rows = num_hashes // bands
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, k=k, num_hashes=num_hashes)

    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("doc_id", "sig", F.explode(band_cols).alias("bb")).select(
        "doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            (
                F.expr(
                    "size(filter(zip_with(l.sig, r.sig, (x, y) -> x = y), b -> b))"
                ).cast("double")
                / F.lit(num_hashes)
            ).alias("est_jaccard"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
    return pairs


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, prefix_len: int = 64
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs sharing a content
    prefix bucket — the verification stage after cheap LSH/prefix
    blocking. Pairwise work only happens inside buckets, never across
    the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.md5(F.substring("text", 1, prefix_len)).alias("ph"),
        F.array_distinct(F.split(F.col("text"), " ")).alias("toks"),
    )
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    return (
        a.join(
            b,
            (F.col("a.ph") == F.col("b.ph"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _simhash_frame(docs: DataFrame, nbits: int = 64) -> DataFrame:
    """-> (doc_id, simhash) 64-bit SimHash per document: per-bit signed
    vote over token hashes, JVM-side only (explode -> conditional sums
    -> bit OR-fold)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(nbits)
    ]
    per_doc = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(nbits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return per_doc.select("doc_id", fp.alias("simhash"))


def simhash_fingerprints(
    spark: SparkSession, sf_dir: str, nbits: int = 64
) -> DataFrame:
    """64-bit SimHash per document (see _simhash_frame)."""
    docs = load_table(spark, sf_dir, "documents")
    return _simhash_frame(docs, nbits=nbits).orderBy("doc_id")


def simhash_near_dup(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = 3,
    bands: int = 4,
    nbits: int = 64,
) -> DataFrame:
    """SimHash near-duplicate pairs via band-bucket candidate join.

    The 64-bit fingerprint splits into ``bands`` disjoint bit-bands; by
    pigeonhole, any pair within ``bands - 1`` differing bits shares at
    least one identical band, so candidates form only inside band-bucket
    groups (hash join on 16-bit keys — never all-pairs). Survivors are
    filtered on exact Hamming distance bit_count(a XOR b) <= threshold.
    With the default max_hamming = bands - 1 the result is EXACT (no
    false negatives), not approximate. Only (doc_id, 8-byte
    fingerprint) ever shuffles.
    """
    width = nbits // bands
    mask = (1 << width) - 1
    docs = load_table(spark, sf_dir, "documents")
    sig = _simhash_frame(docs, nbits=nbits)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "doc_id", "simhash", F.explode(band_cols).alias("bb")
    ).select(
        "doc_id", "simhash",
        F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    hamming = F.bit_count(
        F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
    ).cast("long")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
