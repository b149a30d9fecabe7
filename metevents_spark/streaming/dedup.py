"""Streaming near-duplicate detection: MinHash-LSH dedup on ingest.

The batch path (text/dedup.py) dedups a corpus that already exists;
a pretraining ingest wants the same signal AS DOCUMENTS ARRIVE — flag
each incoming document against everything already accepted, so the
writer can drop or tag near-dups before they ever land in a shard.
Same sketch family as batch (k-shingles -> Kirsch-Mitzenmacher MinHash
-> banded buckets), so streaming and batch agree document-for-document:
signatures, band buckets, and est_jaccard are computed with IDENTICAL
expressions, and the emitted pair set over a replayed corpus equals
the batch pair set (asserted in tests/test_streaming_dedup.py).

Spark shape:
  - signature + band buckets are PURE MAP-SIDE column expressions on
    the stream (higher-order array functions; no shuffle, no
    aggregation — a per-doc signature needs nothing but the doc), so
    the only stateful stage is the bucket store;
  - state lives per (band, bucket) key in ``applyInPandasWithState``:
    the signatures previously seen in that bucket, flattened to a
    fixed-schema long array. An arriving document compares against its
    bucket's residents with one vectorized numpy pass and emits every
    pair whose estimated Jaccard clears the threshold;
  - hot buckets close at ``max_bucket`` residents (the streaming analog
    of the batch hot-bucket drop): new arrivals in a closed bucket are
    neither compared nor stored there — bounded state and bounded
    per-batch work per key, the only viable contract on an unbounded
    stream. Other bands still cover the document.

A pair discovered in several bands is emitted once PER DISCOVERING
BUCKET (at-least-once, always with the same est_jaccard since the
estimate depends only on the two signatures); sinks that need
exactly-once pairs dedupe on (doc_a, doc_b) downstream. For unbounded
retention use GroupStateTimeout event-time timeouts with a watermark
to age buckets out; the default keeps buckets forever (the
replay-a-corpus case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

PAIR_OUTPUT_SCHEMA = "doc_a long, doc_b long, est_jaccard double"
BUCKET_STATE_SCHEMA = StructType(
    [
        StructField("doc_ids", ArrayType(LongType())),
        StructField("sigs", ArrayType(LongType())),  # flattened n x H
        StructField("closed", IntegerType()),
    ]
)


def minhash_sig_col(text_col, k: int = 3, num_hashes: int = 32):
    """Per-row MinHash signature as ONE map-side column expression —
    the streaming-safe formulation of text/dedup.py's
    minhash_signatures (same shingles, same masked K-M family
    g_i = h1 + i*h2, identical values), trading the batch explode +
    groupBy-min for higher-order array mins that need no aggregation.
    """
    toks = F.split(text_col, " ")
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    h1 = lambda s: F.xxhash64(s).bitwiseAND(F.lit((1 << 62) - 1))  # noqa: E731
    h2 = lambda s: F.xxhash64(s, F.lit(1)).bitwiseAND(  # noqa: E731
        F.lit((1 << 32) - 1)
    )

    def nth_min(i: int):
        # closure factory, NOT a default-arg lambda: a two-parameter
        # lambda is treated by F.transform as (element, index) and the
        # array index would silently shadow the hash-function number
        return F.array_min(
            F.transform(shingles, lambda s: h1(s) + F.lit(i) * h2(s))
        )

    return F.array(*[nth_min(i) for i in range(num_hashes)])


def band_bucket_cols(sig_col, num_hashes: int = 32, bands: int = 8):
    """(band, bucket) struct array from a signature column — identical
    bucket ids to the batch LSH (xxhash64 over the comma-joined band
    rows), so streaming and batch block the same documents together."""
    rows = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            sig_col[b * rows + r].cast("string")
                            for r in range(rows)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def stream_minhash_dedup(
    stream_df: DataFrame,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pair stream over a document stream (doc_id, text).

    Emits (doc_a, doc_b, est_jaccard) with doc_a < doc_b as soon as
    the second member of a pair arrives; replaying a static corpus
    yields exactly the batch minhash_near_dup pair set (same sketch,
    same buckets, same estimate — pytest-pinned).
    """
    H = num_hashes

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            doc_ids, flat, closed = state.get
            doc_ids = list(doc_ids)
            flat = list(flat)
        else:
            doc_ids, flat, closed = [], [], 0
        stored = np.asarray(flat, dtype=np.int64).reshape(-1, H)
        out_a: list[int] = []
        out_b: list[int] = []
        out_e: list[float] = []
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        # deterministic intra-batch order (doc_id): pair SETS are order
        # independent below the cap; this fixes WHICH docs a closing
        # bucket stores
        batch = batch.sort_values("doc_id", kind="stable")
        for doc_id, sig in zip(
            batch["doc_id"].astype("int64"), batch["sig"]
        ):
            if closed:
                break
            sig_arr = np.asarray(sig, dtype=np.int64)
            if stored.shape[0]:
                est = (stored == sig_arr).mean(axis=1)
                for j in np.flatnonzero(est >= threshold):
                    other = doc_ids[j]
                    if other == doc_id:
                        continue
                    out_a.append(min(other, int(doc_id)))
                    out_b.append(max(other, int(doc_id)))
                    out_e.append(float(est[j]))
            if len(doc_ids) < max_bucket:
                doc_ids.append(int(doc_id))
                stored = np.vstack([stored, sig_arr[None, :]])
            else:
                closed = 1
        state.update((doc_ids, stored.ravel().tolist(), int(closed)))
        if out_a:
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_e}
            )

    sig = minhash_sig_col(F.col("text"), k=k, num_hashes=num_hashes)
    banded = stream_df.select(
        F.col("doc_id").cast("long").alias("doc_id"), sig.alias("sig")
    ).select(
        "doc_id",
        "sig",
        F.explode(
            band_bucket_cols(F.col("sig"), num_hashes=num_hashes, bands=bands)
        ).alias("bb"),
    ).select(
        "doc_id",
        "sig",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        fn,
        PAIR_OUTPUT_SCHEMA,
        BUCKET_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
