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
  - hot buckets close at ``max_bucket`` DISTINCT-SIGNATURE residents
    (exact copies join their group without consuming a slot — the same
    rep-level accounting as the batch exact-dedup-first cap): new
    arrivals in a closed bucket are neither compared nor stored there —
    bounded state and bounded per-batch work per key, the only viable
    contract on an unbounded stream. Other bands still cover the
    document.

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
        StructField("group_of", ArrayType(IntegerType())),  # per doc
        StructField("sigs", ArrayType(LongType())),  # flattened g x H
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

    Cap accounting mirrors the batch path's exact-dedup-first design:
    bucket residency is counted per DISTINCT SIGNATURE (one stored
    signature row per exact-duplicate group; arriving exact copies
    join their group without consuming a resident slot), so a
    duplicate-heavy corpus cannot close a bucket the batch rep-level
    cap would keep open. Replay equality therefore holds whenever
    every bucket's REPRESENTATIVE count is <= ``max_bucket`` — the
    same condition under which the batch guard leaves the bucket
    untouched. Above the cap the two still diverge by design: batch
    drops the whole over-cap bucket retroactively, while a stream
    cannot un-emit — it keeps the first ``max_bucket`` groups and
    closes (other bands still cover the documents).
    """
    H = num_hashes

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            doc_ids, group_of, flat, closed = state.get
            doc_ids = list(doc_ids)
            group_of = list(group_of)
            flat = list(flat)
        else:
            doc_ids, group_of, flat, closed = [], [], [], 0
        stored = np.asarray(flat, dtype=np.int64).reshape(-1, H)
        # members[g] = doc_ids of exact-duplicate group g (same sig)
        members: list[list[int]] = [[] for _ in range(stored.shape[0])]
        for d, g in zip(doc_ids, group_of):
            members[g].append(int(d))
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
            doc_id = int(doc_id)
            sig_arr = np.asarray(sig, dtype=np.int64)
            own_group = -1
            if stored.shape[0]:
                est = (stored == sig_arr).mean(axis=1)
                for j in np.flatnonzero(est >= threshold):
                    ej = float(est[j])
                    for other in members[j]:
                        if other == doc_id:
                            continue
                        out_a.append(min(other, doc_id))
                        out_b.append(max(other, doc_id))
                        out_e.append(ej)
                exact = np.flatnonzero(est == 1.0)
                if exact.size:
                    own_group = int(exact[0])
            if own_group >= 0:
                # exact copy: joins its group, consumes no resident slot
                members[own_group].append(doc_id)
                doc_ids.append(doc_id)
                group_of.append(own_group)
            elif stored.shape[0] < max_bucket:
                members.append([doc_id])
                doc_ids.append(doc_id)
                group_of.append(stored.shape[0])
                stored = np.vstack([stored, sig_arr[None, :]])
            else:
                closed = 1
        state.update(
            (doc_ids, group_of, stored.ravel().tolist(), int(closed))
        )
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
