from metevents_spark.text.stats import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    rolling_fingerprint,
    text_stats,
    token_count_bpe,
)
from metevents_spark.text.dedup import (  # noqa: F401
    exact_dedup,
    minhash_near_dup,
    ngram_jaccard_pairs,
    prefix_dedup,
    simhash_fingerprints,
    simhash_near_dup,
)
