"""Streaming MinHash dedup must agree with the batch path exactly:
same per-document signatures (map-side HOF formulation vs explode +
groupBy-min), and — replaying the corpus as a file stream — the same
near-dup pair set with the same estimates, independent of chunking.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pandas as pd
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sdedup")
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def test_map_side_signature_matches_batch(spark):
    from pyspark.sql import functions as F

    from metevents_spark.io import load_table
    from metevents_spark.streaming.dedup import minhash_sig_col
    from metevents_spark.text.dedup import minhash_signatures

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    batch = {
        r.doc_id: list(r.sig)
        for r in minhash_signatures(docs).collect()
    }
    mapside = {
        r.doc_id: list(r.sig)
        for r in docs.select(
            "doc_id", minhash_sig_col(F.col("text")).alias("sig")
        ).collect()
    }
    assert batch == mapside


def _run_stream(spark, stream_dir, n_chunks: int, name: str):
    from metevents_spark.streaming import stream_minhash_dedup

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[
        ["doc_id", "text"]
    ].sort_values("doc_id")
    Path(stream_dir, f"in_{name}").mkdir()
    splits = [
        docs.iloc[i * len(docs) // n_chunks : (i + 1) * len(docs) // n_chunks]
        for i in range(n_chunks)
    ]
    for i, chunk in enumerate(splits):
        chunk.to_parquet(f"{stream_dir}/in_{name}/chunk{i}.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/in_{name}")
    )
    out = stream_minhash_dedup(stream, threshold=0.5)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(f"neardup_{name}")
        .option("checkpointLocation", f"{stream_dir}/ckpt_{name}")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(f"SELECT * FROM neardup_{name}").collect()
    # at-least-once across discovering buckets -> dedupe to the pair set
    return {(r.doc_a, r.doc_b): r.est_jaccard for r in rows}


def test_stream_pairs_equal_batch_and_chunk_invariant(spark, stream_dir):
    from metevents_spark.text.dedup import minhash_near_dup

    batch = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_near_dup(
            spark, SF_SMALL, threshold=0.5, sort=False
        ).collect()
    }
    assert batch  # fixture sanity: the corpus contains near-dups

    one = _run_stream(spark, stream_dir, 1, "one")
    three = _run_stream(spark, stream_dir, 3, "three")

    assert one == batch
    assert three == batch
