"""media_embed / media_embedding_near_dup: planted-duplicate recall and
embedding invariants."""

from __future__ import annotations

import numpy as np
import pytest

from metevents_spark.multimodal.media import (
    media_embed,
    media_embedding_near_dup,
)

from tests.conftest import SF_SMALL


def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, media binary",
    )


def test_embed_unit_norm_and_determinism(spark):
    p1 = bytes(range(256)) * 4
    df = _media_df(spark, [p1, p1, b"\x00" * 100])
    out = media_embed(df).toPandas().sort_values("doc_id")
    v0, v1, v2 = [np.asarray(v) for v in out["vec"]]
    assert np.allclose(np.linalg.norm(v0), 1.0)
    assert (v0 == v1).all()            # identical payloads embed identically
    assert not (v0 == v2).all()
    # all-zero-byte payload concentrates in bin 0
    assert v2[0] == 1.0 and v2[1:].sum() == 0


def test_near_dup_finds_planted_pairs(spark, tmp_path):
    # identical payloads -> cosine 1.0 pair; one-byte flip -> near-1
    import pandas as pd

    base = bytes(np.random.RandomState(0).randint(0, 256, 4096, dtype=np.uint8))
    flip = bytearray(base)
    flip[100] = (flip[100] + 1) % 256
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a", "b", "c", "d"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [1] * 4,
        }
    )
    # write a miniature corpus dir whose fake media we CONTROL by
    # monkeypatching attach_fake_media is overkill — instead test the
    # kernel directly on a media frame
    from metevents_spark.multimodal import media as M

    emb = M.media_embed(_media_df(spark, [base, bytes(flip), b"x" * 50]))
    out = emb.toPandas().sort_values("doc_id")
    v = [np.asarray(x) for x in out["vec"]]
    cos = float(v[0] @ v[1])
    assert cos > 0.999                 # one-byte flip stays near-identical
    assert float(v[0] @ v[2]) < 0.999


def test_near_dup_end_to_end(spark):
    out = media_embedding_near_dup(spark, SF_SMALL).toPandas()
    # fake payloads derive from text; exact text copies embed at 1.0 —
    # output shape and ordering invariants hold either way
    assert list(out.columns) == ["doc_a", "doc_b", "block", "cosine"]
    assert (out["doc_a"] < out["doc_b"]).all()
    assert out["cosine"].between(-1.0, 1.0001).all()
