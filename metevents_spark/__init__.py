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
"""

__version__ = "0.1.0"

from metevents_spark.session import get_spark  # noqa: F401
