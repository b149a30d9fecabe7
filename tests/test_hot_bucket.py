"""Hot-bucket guard for the LSH candidate self-joins.

Near-identical boilerplate documents (one token differs, so they
survive exact-dedup) concentrate one (band, bucket) group; without a
cap the bucket self-join goes quadratic in that bucket at corpus
scale. The guard drops over-cap buckets before pairing; any pair
dropped with one band can still be found via its other bands.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from metevents_spark.text.dedup import (
    HOT_BUCKET_CAP,
    LAST_GUARD_METRICS,
    minhash_near_dup,
    simhash_near_dup,
)

SF = "/root/testdata/sf0.001"

N_HOT = 80


def _hot_corpus_dir(spark, tmp_path):
    """N_HOT docs sharing a long boilerplate body, each with one unique
    trailing token: all survive exact-dedup, nearly all land in the
    same LSH bucket in every band."""
    boiler = " ".join(f"tok{i % 7}" for i in range(60))
    rows = [
        (i, f"{boiler} unique{i}", "en", "src0", 400) for i in range(N_HOT)
    ]
    df = spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(path)
    return str(tmp_path)


def test_hot_bucket_capped_pair_count_bounded(spark, tmp_path):
    sf = _hot_corpus_dir(spark, tmp_path)
    # uncapped: the hot bucket pairs quadratically
    naive = minhash_near_dup(spark, sf, max_bucket=10**9).count()
    assert naive == N_HOT * (N_HOT - 1) // 2
    # capped below the hot bucket's size: the bucket is dropped and the
    # pair count collapses; the query still completes
    capped = minhash_near_dup(spark, sf, max_bucket=20)
    n_capped = capped.count()
    assert n_capped < naive
    dropped = LAST_GUARD_METRICS["minhash_lsh_guard"]["dropped_buckets"]
    rows = dropped.collect()
    assert rows and max(r.bsz for r in rows) >= N_HOT


def test_hot_bucket_guard_observes_sizes(spark, tmp_path):
    sf = _hot_corpus_dir(spark, tmp_path)
    simhash_near_dup(spark, sf, max_bucket=20).count()
    dropped = LAST_GUARD_METRICS["simhash_lsh_guard"]["dropped_buckets"]
    assert dropped.count() > 0


def test_guard_is_adaptive_no_antijoin_on_healthy_corpus(spark):
    """On a corpus with no over-cap bucket the guard must return the
    banded frame untouched — the candidate join runs the exact
    pre-guard plan (no LeftAnti join node), so healthy corpora pay
    zero plan overhead for the protection."""
    from metevents_spark.text.dedup import minhash_near_dup as mnd

    plan = mnd(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan, plan


def test_default_cap_does_not_change_normal_output(spark):
    """On the real fixture every bucket is far below HOT_BUCKET_CAP, so
    the guarded output must equal the unguarded one."""
    guarded = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_near_dup(spark, SF).collect()
    }
    unguarded = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_near_dup(spark, SF, max_bucket=10**9).collect()
    }
    assert guarded == unguarded
    sim_g = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup(spark, SF).collect()
    }
    sim_u = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup(spark, SF, max_bucket=10**9).collect()
    }
    assert sim_g == sim_u
    assert HOT_BUCKET_CAP >= 1000
