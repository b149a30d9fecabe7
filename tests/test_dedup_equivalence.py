"""Differential tests for the exact-dedup-first rewrites.

The optimized pairwise operators (MinHash / SimHash / blocked cosine)
collapse identical content to representatives and expand pairs back.
These tests re-run the NAIVE formulation (signatures over every row,
bucket self-join over every row) in-line and assert the optimized
output is identical — the equivalence argument ("exact copies share
fingerprints") checked by construction, not by eyeball.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from metevents_spark.io import load_table
from metevents_spark.text.dedup import minhash_signatures

SF = "/root/testdata/sf0.001"


def _naive_minhash_pairs(spark, num_hashes=32, bands=8, threshold=0.5):
    rows = num_hashes // bands
    docs = load_table(spark, SF, "documents")
    sig = minhash_signatures(docs, k=3, num_hashes=num_hashes)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.col("sig")[b * rows + r].cast("string")
                            for r in range(rows)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "doc_id", "sig", F.explode(band_cols).alias("bb")
    ).select(
        "doc_id",
        "sig",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    left, right = banded.alias("l"), banded.alias("r")
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
            (
                F.expr(
                    "size(filter(zip_with(l.sig, r.sig, (x, y) -> x = y),"
                    " b -> b))"
                ).cast("double")
                / F.lit(num_hashes)
            ).alias("est_jaccard"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def test_minhash_rep_expansion_matches_naive_self_join(spark):
    from metevents_spark.text.dedup import minhash_near_dup

    naive = sorted(
        tuple(r) for r in _naive_minhash_pairs(spark).collect()
    )
    opt = sorted(
        tuple(r) for r in minhash_near_dup(spark, SF).collect()
    )
    assert opt == naive


def test_simhash_fingerprints_cover_every_doc_once(spark):
    from metevents_spark.text.dedup import simhash_fingerprints

    fp = simhash_fingerprints(spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    assert len(fp) == docs.count()
    assert len({r.doc_id for r in fp}) == len(fp)
    # identical texts must carry identical fingerprints
    by_text = docs.select(
        "doc_id", F.md5("text").alias("h")
    ).collect()
    h_of = {r.doc_id: r.h for r in by_text}
    sig_of_hash = {}
    for r in fp:
        sig_of_hash.setdefault(h_of[r.doc_id], set()).add(r.simhash)
    assert all(len(s) == 1 for s in sig_of_hash.values())


def test_blocked_cosine_matches_naive_gram(spark):
    from metevents_spark.similarity import embedding_near_dup

    emb = load_table(spark, SF, "embeddings").toPandas()
    expected = []
    for label, grp in emb.groupby("label"):
        grp = grp.sort_values("vec_id").reset_index(drop=True)
        m = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        sims = np.round((m @ m.T) / np.outer(norms, norms), 6)
        ia, ib = np.triu_indices(len(grp), k=1)
        keep = sims[ia, ib] >= 0.35
        ids = grp["vec_id"].to_numpy()
        for i, j in zip(ia[keep], ib[keep]):
            expected.append(
                (int(ids[i]), int(ids[j]), int(label), float(sims[i, j]))
            )
    got = sorted(
        tuple(r) for r in embedding_near_dup(spark, SF).collect()
    )
    assert got == sorted(expected)


def test_duplicate_spans_exact_semantics(spark, tmp_path):
    """Hand-built corpus: two docs share a 12-token run embedded in
    unique context; with n=8 the shared run yields 5 consecutive
    duplicated gram positions in each doc. A third doc shares nothing
    and must be absent."""
    from metevents_spark.text.dedup import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (0, f"u0 u1 {shared} v0", "en", "src0", 99),
        (1, f"w0 {shared} x0 x1", "en", "src0", 99),
        (2, " ".join(f"z{i}" for i in range(16)), "en", "src0", 99),
    ]
    df = spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = [
        (r.doc_id, r.start_pos, r.end_pos, r.span_tokens, r.n_grams)
        for r in duplicate_spans(spark, str(tmp_path), n=8, min_run=3).collect()
    ]
    # doc0: shared tokens at 3..14 -> dup gram positions 3..7
    # doc1: shared tokens at 2..13 -> dup gram positions 2..6
    assert got == [(0, 3, 7, 12, 5), (1, 2, 6, 12, 5)]


def test_remove_duplicate_spans_rewrite(spark, tmp_path):
    """The applied rewrite drops exactly the tokens under each span
    (gram positions a..b cover tokens a..b+n-1) and leaves untouched
    docs byte-identical."""
    from metevents_spark.text.dedup import remove_duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))
    unique2 = " ".join(f"z{i}" for i in range(16))
    rows = [
        (0, f"u0 u1 {shared} v0", "en", "src0", 99),
        (1, f"w0 {shared} x0 x1", "en", "src0", 99),
        (2, unique2, "en", "src0", 99),
    ]
    df = spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in remove_duplicate_spans(spark, str(tmp_path), n=8, min_run=3).collect()
    }
    # doc0: span grams 3..7 -> tokens 3..14 removed (the 12 shared)
    assert got[0] == (15, 12, "u0 u1 v0")
    # doc1: span grams 2..6 -> tokens 2..13 removed
    assert got[1] == (15, 12, "w0 x0 x1")
    # doc2 untouched
    assert got[2] == (16, 0, unique2)
