from metevents_spark.text.stats import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    text_stats,
)
from metevents_spark.text.dedup import (  # noqa: F401
    exact_dedup,
    minhash_near_dup,
    prefix_dedup,
    simhash_fingerprints,
)
