"""Tracked persist registry: release cached intermediates between queries.

Several operators persist an intermediate that feeds multiple branches
of one query plan (LSH band frames, exact-dedup member maps, TF-IDF
term counts). Those frames are part of the RETURNED DataFrame's lineage,
so the operator cannot unpersist before the caller materializes the
result — but leaving them cached leaks storage across a long session
(the correctness driver and bench run 50-66 queries on one
SparkSession). Operators register persists via ``track``; the query
registry (metevents_spark.queries) releases everything tracked at the
START of each query, after the previous query's result has been
materialized. Unpersist only drops the cache, never lineage, so a
caller that re-materializes an old result is still correct — it just
recomputes.
"""

from __future__ import annotations

from typing import TypeVar

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []

T = TypeVar("T", bound=DataFrame)


def track(df: T) -> T:
    """Register a persisted DataFrame for later release; returns it."""
    _TRACKED.append(df)
    return df


def release(df: DataFrame) -> None:
    """Unpersist ``df`` whether it was cached via ``persist()`` (the
    CacheManager path) or via ``localCheckpoint`` — whose persistence
    lives on the UNDERLYING RDD, where ``DataFrame.unpersist()`` is a
    silent no-op: a checkpointed frame's analyzed plan is a LogicalRDD
    and the storage entry belongs to that RDD, so it must be released
    directly (otherwise it lingers until the JVM ContextCleaner
    GC-notices the dropped reference — unbounded storage-tier drift
    across a long 169-query session)."""
    df.unpersist()
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:
        pass  # defensive: a failed release must never fail a query


def release_all() -> int:
    """Unpersist every tracked DataFrame (no-op on already-released
    ones). Returns how many frames were released."""
    n = len(_TRACKED)
    while _TRACKED:
        release(_TRACKED.pop())
    return n
