"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with structured
metadata, processed by Arrow-batched ``mapInPandas`` kernels — the
Spark-side plumbing (schema, partitioning, batch shape) is real and
tested; the actual codec step is import-gated (PIL/av are not in this
container) and falls back to a deterministic fake decoder so pipelines
are exercisable end-to-end.

Scale notes: binary payloads never shuffle here — features extract
map-side in one pass; only the (small) feature rows move. For real
media at 100 TB, payloads would live in parquet binary columns or
object-store references; either way the kernel signature is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic binary payload per document (stands in
    for a stored image/audio blob; real data arrives as parquet binary).
    JVM-side: encode(text) — no Python."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_real(payload: bytes) -> tuple[int, int]:
    """Real decode path — import-gated; raises when codecs are absent."""
    try:
        from PIL import Image  # type: ignore
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs not available in this environment"
        ) from exc


def _decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in decode: pseudo width/height derived from
    payload length (stable across engines/runs, SQL-mirrorable)."""
    width = 64 + len(payload) % 192
    height = 64 + (len(payload) * 7) % 192
    return width, height


def media_features(media_df: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Per-payload features via mapInPandas: byte length, sha256, and
    decoded dimensions (fake decoder unless real codecs requested)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_real if use_real_codecs else _decode_fake
        for pdf in batches:
            payloads = pdf["media"].tolist()
            dims = [decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "width": pd.Series([d[0] for d in dims], dtype="int64"),
                    "height": pd.Series([d[1] for d in dims], dtype="int64"),
                }
            )

    return media_df.mapInPandas(
        extract,
        "doc_id long, n_bytes long, sha256 string, width long, height long",
    ).orderBy("doc_id")


def frame_sample(
    media_df: DataFrame, n_frames: int = 4, frame_bytes: int = 16
) -> DataFrame:
    """Frame-sampling shape for video-like payloads: each payload
    explodes into ``n_frames`` evenly spaced byte windows (the real
    sampler would seek keyframes; the batch/explode plumbing is what
    scales)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                n = len(payload)
                if n == 0:
                    continue
                step = max(n // n_frames, 1)
                for k in range(min(n_frames, n)):
                    off = k * step
                    doc_ids.append(int(doc_id))
                    idxs.append(k)
                    frames.append(bytes(payload[off : off + frame_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": frames,
                }
            )

    return media_df.mapInPandas(
        sample, "doc_id long, frame_idx long, frame binary"
    )


def media_resize(
    media_df: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    use_real_codecs: bool = False,
) -> DataFrame:
    """Resize shape: payload -> fixed-size thumbnail payload. The real
    path (PIL, import-gated) decodes/resizes/re-encodes; the fake path
    deterministically resamples the raw bytes to ``target_w*target_h``
    via evenly spaced strides — same schema, batch flow, and output
    sizing either way, so the pipeline is swappable to real codecs
    without a plan change."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            out: list[bytes] = []
            for payload in pdf["media"]:
                if use_real_codecs:
                    raise NotImplementedError(
                        "image codecs not available in this environment"
                    )
                n = len(payload)
                if n == 0:
                    out.append(b"\x00" * n_out)
                    continue
                idx = [(k * n) // n_out for k in range(n_out)]
                out.append(bytes(payload[i] for i in idx))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([target_w] * len(pdf), dtype="int64"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int64"),
                    "thumb": out,
                }
            )

    return media_df.mapInPandas(
        resize, "doc_id long, width long, height long, thumb binary"
    )


def media_pipeline(spark, sf_dir: str) -> DataFrame:
    """documents -> fake media -> features (the end-to-end multimodal
    query registered with the driver)."""
    from metevents_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return media_features(attach_fake_media(docs))


def media_dedup(media_df: DataFrame) -> DataFrame:
    """Exact content-hash dedup over binary payloads — the first stage
    of any multimodal ingest (identical images/audio recur massively in
    web crawls). Only 64-char digests shuffle; payloads never leave the
    scan. Output maps every document to its canonical representative
    (min doc_id per digest) with the copy count.
    """
    from pyspark.sql import Window

    digests = media_df.select(
        "doc_id", F.sha2(F.col("media"), 256).alias("digest")
    )
    w = Window.partitionBy("digest")
    return digests.select(
        "doc_id",
        F.min("doc_id").over(w).alias("rep_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_copies"),
    ).orderBy("doc_id")


def media_embed(media_df: DataFrame, dim: int = 32) -> DataFrame:
    """Content embedding for binary payloads: the L2-normalized
    ``dim``-bin byte histogram — a crude but REAL content feature
    (identical payloads embed identically; near-identical payloads
    embed nearby), and the swap point for a learned encoder: replace
    the histogram line with a CLIP/wav2vec forward pass and the
    surrounding plumbing (Arrow batches in, fixed-width vector column
    out, payloads never shuffle) is exactly what a production encoder
    needs.
    """
    import numpy as np

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for payload in pdf["media"]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                h = np.bincount(b >> int(8 - np.log2(dim)), minlength=dim)[
                    :dim
                ].astype(np.float64)
                n = np.linalg.norm(h)
                vecs.append((h / n if n else h).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "vec": vecs,
                }
            )

    return media_df.mapInPandas(embed, "doc_id long, vec array<double>")


def media_embedding_near_dup(
    spark, sf_dir: str, threshold: float = 0.999, dim: int = 32
) -> DataFrame:
    """End-to-end multimodal near-dup: payload -> content embedding ->
    blocked cosine pairs — the decode→embed→ANN composition a
    multimodal ingest runs to catch re-encoded copies that the exact
    content hash (media_dedup) misses.

    Blocking key = the embedding's dominant histogram bin (argmax) —
    content-derived, so near-identical payloads land in the same block
    and the pairwise gram matrix never leaves a block (the same
    bounded-bucket discipline as every other pairwise family here).
    Rows-only check (hash-family-free but the blocking is
    content-dependent); tests plant byte-identical and one-byte-flip
    payload pairs and assert both surface.
    """
    import numpy as np
    from metevents_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = media_embed(attach_fake_media(docs), dim=dim)
    blocked = emb.select(
        "doc_id",
        "vec",
        F.expr(
            "array_position(vec, array_max(vec))"
        ).cast("int").alias("block"),
    )
    out_schema = "doc_a long, doc_b long, block int, cosine double"

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "block": pd.Series([], dtype="int32"),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        m = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        sims = np.round(m @ m.T, 6)
        ra, rb = np.triu_indices(len(ids), k=1)
        keep = sims[ra, rb] >= threshold
        return pd.DataFrame(
            {
                "doc_a": ids[ra[keep]],
                "doc_b": ids[rb[keep]],
                "block": np.full(keep.sum(), pdf["block"].iloc[0], dtype="int32"),
                "cosine": sims[ra[keep], rb[keep]],
            }
        )

    return (
        blocked.groupBy("block")
        .applyInPandas(block_pairs, out_schema)
        .orderBy("doc_a", "doc_b")
    )
