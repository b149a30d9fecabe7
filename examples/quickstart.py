"""Quickstart: the reference workflow (examples/simple.py in
M3Works/metevents) and its distributed extensions, end to end.

Run: python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

from metevents_spark.session import get_spark
from metevents_spark.io import series_frame
from metevents_spark.api import StormEvents
from metevents_spark.operators import extreme_value, storm_find

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

# --- reference-shaped API: pandas Series in, events out ------------------
import pandas as pd

series = pd.Series(
    [0.0, 0.3, 0.4, 0.0, 0.0, 0.0, 0.0, 0.2, 0.3, 0.6, 0.0],
    index=pd.date_range("2023-01-01", periods=11, freq="D"),
)
ev = StormEvents(series, spark=spark)
ev.find(instant_mass_to_start=0.1, min_storm_total=0.5, hours_to_stop=24)
print(f"storms found (reference-shaped API): N={ev.N}")
for p in ev.events:
    print(f"  {p.start} -> {p.stop}  total={p.total}")

# --- distributed path: thousands of series in one DataFrame --------------
df = series_frame(spark, sf_dir)
print("\nextreme values (distributed, all series at once):")
extreme_value(df, expected_max=400.0, expected_min=1.0).show(5)

print("storms (grouped-map numpy kernel, one Arrow pass per partition):")
storm_find(df, instant_mass_to_start=100.0, min_storm_total=500.0).show(5)

# --- training-data ops over the documents/embeddings tables --------------
from metevents_spark.text import minhash_near_dup, text_stats
from metevents_spark.similarity import knn_cosine

print("near-duplicate pairs (MinHash-LSH):")
minhash_near_dup(spark, sf_dir).show(5)
print("document quality stats:")
text_stats(spark, sf_dir).show(5)
print("top-5 cosine neighbors of the first 5 vectors:")
knn_cosine(spark, sf_dir).show(5)

# --- product analytics + corpus reporting --------------------------------
from metevents_spark.relational import funnel_conversion
from metevents_spark.text import corpus_summary

print("signup -> view -> click -> purchase funnel:")
funnel_conversion(spark, sf_dir).show()
print("per-source corpus health:")
corpus_summary(spark, sf_dir).show(5)

# --- the whole registry as a SQL surface ---------------------------------
from metevents_spark.queries import register_operator_views

register_operator_views(spark, sf_dir)
print("ANSI SQL over any operator result (q_<name> views):")
spark.sql(
    "SELECT source, dup_share, quality_pass_share "
    "FROM q_corpus_summary ORDER BY dup_share DESC LIMIT 5"
).show()

spark.stop()
