"""metevents-spark: a PySpark-native event-detection & analytics engine.

Re-expresses the query semantics of the reference library
(M3Works/metevents, pandas-based event detection over datetime-indexed
series) as lazy Spark DataFrame plans, plus the relational / dedup /
similarity / text operators a large-scale training-data pipeline needs.

Design (see SURVEY.md):
  - Canonical series frame: (sid STRING, seq LONG, ts TIMESTAMP, value DOUBLE)
  - Events frame:           (sid, start, stop, duration_us, n_points, total)
  - Detection = predicate -> gaps-and-islands run grouping (window cumsum)
    -> groupBy aggregation. One shuffle on sid, shared by window + agg.
  - Sequential per-series semantics (storm merge, peak finding) live in
    Arrow-vectorized ``applyInPandas`` kernels above the Catalyst planner.

Cache-release contract (direct-API users): many operators ``persist()``
an intermediate that feeds several branches of the returned plan (LSH
band frames, exact-dedup member maps, pagerank's transition frame, …).
The registry entry points (``metevents_spark.queries.QUERIES`` /
``__spark_entry__.queries()``) release every tracked frame at the START
of each query, so driver/bench sessions never accumulate storage. If you
call operator FUNCTIONS directly instead, call
``metevents_spark.release_caches()`` (re-exported from
``metevents_spark.cache.release_all``) after materializing each result —
unpersist drops only the cache, never lineage, so held results stay
usable and simply recompute if re-materialized.
"""

__version__ = "0.1.0"

from metevents_spark.cache import release_all as release_caches  # noqa: F401
from metevents_spark.session import get_spark  # noqa: F401
