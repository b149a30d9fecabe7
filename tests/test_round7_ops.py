"""Semantic properties of the round-7 registrations: temperature
mixing flattens toward uniform as alpha drops, the shuffle-shard
permutation is a reproducible bijection with dense per-shard offsets,
and the Zipf fit matches an independent least-squares computation.
(Oracle equality is pinned separately by tests/test_oracle_parity.py.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def test_temperature_mixture_flattens(spark):
    from metevents_spark.text.pipeline import temperature_mixture

    prop = temperature_mixture(spark, SF_SMALL, alpha=1.0).toPandas()
    temp = temperature_mixture(spark, SF_SMALL, alpha=0.3).toPandas()
    unif = temperature_mixture(spark, SF_SMALL, alpha=0.0).toPandas()

    # alpha=1 -> proportional sampling: weight == share
    assert np.allclose(prop.weight, prop.share, atol=2e-6)
    # alpha=0 -> uniform weights
    assert np.allclose(unif.weight, 1.0 / len(unif), atol=2e-6)
    # weights always normalize
    for df in (prop, temp, unif):
        assert abs(df.weight.sum() - 1.0) < 1e-4
    # 0 < alpha < 1: w_t/w_p is proportional to share^(alpha-1), a
    # strictly DECREASING function of share — so sorted by share, the
    # gain over proportional sampling falls monotonically (smallest
    # sources gain the most, largest lose the most), crossing 1 once
    m = prop.merge(temp, on="source", suffixes=("_p", "_t")).sort_values(
        "share_p"
    )
    gain = (m.weight_t / m.weight_p).to_numpy()
    assert (np.diff(gain) < 1e-3).all()
    assert gain[0] > 1.0 > gain[-1]
    # temperature weights are strictly flatter (lower spread)
    assert temp.weight.std() < prop.weight.std()


def test_shuffle_shards_is_reproducible_bijection(spark):
    from metevents_spark.text.pipeline import shuffle_shards

    a = shuffle_shards(spark, SF_SMALL, n_shards=16).toPandas()
    b = shuffle_shards(spark, SF_SMALL, n_shards=16).toPandas()

    # deterministic: identical permutation run-to-run
    pd.testing.assert_frame_equal(a, b)
    # bijection: every document exactly once
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    assert sorted(a.doc_id) == sorted(docs.doc_id)
    # dense 0-based offsets within each shard
    for shard, g in a.groupby("shard"):
        assert sorted(g.offset) == list(range(len(g)))
    # the md5 key spreads docs across shards (no hot shard)
    sizes = a.groupby("shard").size()
    assert len(sizes) == 16
    assert sizes.max() <= 3 * max(sizes.mean(), 1)
    # shard order is NOT doc_id order (it actually shuffles)
    first_shard = a[a.shard == a.shard.iloc[0]]
    assert not first_shard.doc_id.is_monotonic_increasing


def test_zipf_fit_matches_numpy_lstsq(spark):
    from metevents_spark.text.stats import zipf_fit

    out = zipf_fit(spark, SF_SMALL, top_terms=200).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")

    assert (out.zipf_slope < 0).all()  # frequencies fall with rank
    assert (out.n_terms <= 200).all()

    for source, g in docs.groupby("source"):
        terms = pd.Series(
            " ".join(g.text).split(" ")
        ).value_counts()
        tf = (
            pd.DataFrame({"term": terms.index, "tf": terms.values})
            .sort_values(["tf", "term"], ascending=[False, True])
            .head(200)
        )
        x = np.log(np.arange(1, len(tf) + 1))
        y = np.log(tf.tf.to_numpy(dtype=float))
        slope, intercept = np.polyfit(x, y, 1)
        row = out[out.source == source].iloc[0]
        assert abs(row.zipf_slope - slope) < 1e-3, source
        assert abs(row.zipf_intercept - intercept) < 1e-3, source


def test_dedup_recall_report_matches_pandas_ground_truth(spark):
    """Recompute the meter's ground truth independently: the same
    md5-deterministic sample of exact-dedup representatives, exact
    3-shingle Jaccard all-pairs, and minhash pairs restricted to the
    sample — the confusion counts must agree exactly."""
    import hashlib
    import itertools

    from metevents_spark.text.dedup import (
        dedup_recall_report,
        minhash_near_dup,
    )

    threshold, sample, k = 0.5, 200, 3
    out = dedup_recall_report(
        spark, SF_SMALL, threshold=threshold, sample=sample, k=k
    ).collect()[0]

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[
        ["doc_id", "text"]
    ]
    # exact-dedup representatives: min doc_id per text
    reps = docs.sort_values("doc_id").drop_duplicates("text")
    picked = sorted(
        reps.doc_id,
        key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
    )[:sample]
    text_of = dict(zip(reps.doc_id, reps.text))

    def shingles(t: str) -> set[str]:
        toks = t.split(" ")
        n = max(len(toks) - (k - 1), 1)
        return {" ".join(toks[i : i + k]) for i in range(n)}

    sh = {d: shingles(text_of[d]) for d in picked}
    true_pairs = {
        (a, b)
        for a, b in itertools.combinations(sorted(picked), 2)
        if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= threshold
    }
    sample_set = set(picked)
    pred_pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_dup(
            spark, SF_SMALL, threshold=threshold, sort=False
        ).collect()
        if r.doc_a in sample_set and r.doc_b in sample_set
    }

    assert out.n_sample == sample
    assert out.n_true_pairs == len(true_pairs)
    assert out.n_pred_pairs == len(pred_pairs)
    assert out.true_positives == len(true_pairs & pred_pairs)
    if out.n_pred_pairs:
        assert abs(out.precision - len(true_pairs & pred_pairs) / len(pred_pairs)) < 1e-6
    if out.n_true_pairs:
        assert abs(out.recall - len(true_pairs & pred_pairs) / len(true_pairs)) < 1e-6
