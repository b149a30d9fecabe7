"""Persist hygiene: tracked caches drain between registry queries.

The correctness driver and bench run 50-66 queries on one SparkSession;
operators that persist multi-branch intermediates (LSH band frames,
exact-dedup member maps) must not accumulate in the
storage tier across that session.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tests.conftest import SF_SMALL


def persisted_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def drained(spark, timeout: float = 10.0) -> int:
    """Persisted-RDD count after giving the NON-BLOCKING unpersist a
    moment to land: DataFrame.unpersist() defaults to blocking=False,
    so under machine load the cache-manager entry can outlive the
    release_all() call by a beat — poll briefly before judging."""
    import time

    deadline = time.monotonic() + timeout
    n = persisted_rdd_count(spark)
    while n and time.monotonic() < deadline:
        time.sleep(0.2)
        n = persisted_rdd_count(spark)
    return n


def test_registry_queries_release_prior_persists(spark):
    import __spark_entry__ as entrymod
    from metevents_spark.cache import release_all

    release_all()
    qs = entrymod.queries()
    # minhash_near_dup persists member_rep + banded; materialize it
    qs["minhash_near_dup"](spark, SF_SMALL).count()
    assert persisted_rdd_count(spark) >= 1
    # invoking the NEXT registry query must drop the leftovers before
    # (or while) building its own
    qs["exact_dedup"](spark, SF_SMALL).count()
    assert drained(spark) == 0
    # and a persisting query followed by release_all drains fully
    # (tfidf no longer persists — its df-count is a window now — so
    # use the media near-dup, whose member->rep map persists)
    qs["media_embedding_near_dup"](spark, SF_SMALL).count()
    assert release_all() >= 1
    assert drained(spark) == 0
