from metevents_spark.text.stats import (  # noqa: F401
    bm25_rank,
    bpe_pair_counts,
    classifier_score,
    corpus_summary,
    corpus_summary_approx,
    corpus_yield,
    doc_fingerprint,
    lang_id,
    quality_filter,
    repetition_stats,
    rolling_fingerprint,
    source_lang_matrix,
    text_stats,
    tfidf_top_terms,
    token_count_bpe,
    vocab_top_terms,
    vocab_top_terms_approx,
)
from metevents_spark.text.dedup import (  # noqa: F401
    duplicate_spans,
    edit_distance_pairs,
    remove_duplicate_spans,
    exact_dedup,
    minhash_near_dup,
    ngram_jaccard_pairs,
    prefix_dedup,
    simhash_fingerprints,
    simhash_near_dup,
)
from metevents_spark.text.scrub import (  # noqa: F401
    domain_stats,
    pii_redact,
)
