"""End-to-end training-data pipeline over the documents corpus:

    dedup (exact -> MinHash clusters -> keep list)
      -> quality gate (composite filter + unigram-LM deciles)
      -> decontamination (eval n-gram overlap)
      -> packing (token budget sequences)

Run: python examples/training_pipeline.py [sf_dir]
Every stage is the registry operator the correctness gate checks;
this script just chains them the way a pipeline owner would.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

from pyspark.sql import functions as F

from metevents_spark.session import get_spark
from metevents_spark.text.dedup import dedup_keep_list, exact_dedup
from metevents_spark.text.pipeline import (
    decontaminate_ngram,
    quality_bucket_sample,
    sequence_pack,
)
from metevents_spark.text import quality_filter

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
print(f"corpus: {n_docs} documents")

# 1. dedup: exact groups, then near-dup clusters -> one keeper per cluster
groups = exact_dedup(spark, sf_dir)
print(f"  exact-distinct texts: {groups.count()}")
keep = dedup_keep_list(spark, sf_dir, threshold=0.5)
kept = keep.filter("keep")
print(f"  after near-dup clustering keep: {kept.count()}")

# 1b. exact-substring span removal on the survivors: report where
# cross-document duplicated runs sit, then cut them out
from metevents_spark.text.dedup import duplicate_spans, remove_duplicate_spans

spans = duplicate_spans(spark, sf_dir)
print(f"  duplicate spans found: {spans.count()}")
rewritten = remove_duplicate_spans(spark, sf_dir)
cut = rewritten.filter("n_removed > 0")
print(f"  docs with spans cut: {cut.count()}")

# 1c. semantic dedup over the embedding corpus (SemDeDup: k-means
# clusters bound the pairwise cosine sweep)
from metevents_spark.similarity import semantic_dedup

sem = semantic_dedup(spark, sf_dir)
print(f"  semantic-dedup drops: {sem.filter('NOT keep').count()} vectors")

# 1c-bis. the spectral view of the same embedding corpus: covariance
# conditioning + a PCA projection (the reduced space SemDeDup-style
# pipelines cluster in at scale)
from metevents_spark.similarity import pca_embeddings

pca = pca_embeddings(spark, sf_dir, k=4)
print(
    "  PCA projection: "
    f"{pca.count()} vectors -> 4 components "
    f"(pc1 span {pca.agg(F.round(F.max('pc1') - F.min('pc1'), 2)).collect()[0][0]})"
)

# 1d. paragraph-level dedup (CCNet recipe): recurring cross-document
# boilerplate paragraphs removed, first occurrence kept. Our synthetic
# corpus has single-line docs, so split on sentences to demonstrate.
from metevents_spark.text.dedup import paragraph_dedup

docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
    "doc_id", "text"
)
para = paragraph_dedup(docs, sep=". ")
print(
    "  paragraph dedup drops:",
    para.agg(F.sum("n_dropped")).collect()[0][0],
    "paragraphs",
)

# 2. quality: Gopher rule battery, survivorship funnel, composite gate
# + hashed-classifier margin + quality-decile downsampling
from metevents_spark.text.stats import gopher_quality
from metevents_spark.text import classifier_score, corpus_yield

gq = gopher_quality(docs, min_words=5)
print(f"  Gopher rules keep: {gq.filter('keep').count()} / {n_docs}")

print("  per-source yield through the quality gates:")
for r in corpus_yield(spark, sf_dir).limit(5).collect():
    print(
        f"    {r['source']}: {r['n_docs']} -> len {r['n_pass_len']} "
        f"-> +div {r['n_pass_len_div']} -> all {r['n_pass_all']} "
        f"({r['yield_pct']}%)"
    )
passed = quality_filter(spark, sf_dir)
print(f"  quality gate passes: {passed.count()}")
clf = classifier_score(spark, sf_dir)
print(f"  classifier gate keeps: {clf.filter('keep').count()}")
sampled = quality_bucket_sample(spark, sf_dir)
print(f"  quality-bucket sample keeps: {sampled.count()}")

# 2a-bis. information-theoretic quality: low token-entropy evenness
# flags template/boilerplate documents the length ratios miss
from metevents_spark.text.stats import token_entropy

ent = token_entropy(spark, sf_dir)
low_even = ent.filter("evenness IS NOT NULL AND evenness < 0.8").count()
print(f"  low-evenness (templated) docs: {low_even}")

# 2b. corpus forensics: which phrases are per-source boilerplate, and
# does the ingestion stream still carry novelty (dedup ROI)?
from metevents_spark.text.pipeline import boilerplate_phrases, ngram_novelty

bp = boilerplate_phrases(spark, sf_dir)
print(f"  boilerplate phrases flagged: {bp.count()} (top-10 per source)")
nov = ngram_novelty(spark, sf_dir)
last = nov.orderBy("shard").collect()[-1]
print(
    f"  novelty ratio by final shard: {last['novelty_ratio']} "
    f"(cumulative distinct grams {last['cum_distinct']})"
)

# 2c. the ingest boundary: classify a new batch against the already-
# deduped reference corpus without redoing historic work
from metevents_spark.text.dedup import incremental_dedup

inc = incremental_dedup(spark, sf_dir)
by_status = {
    r["status"]: r["n"]
    for r in inc.groupBy("status").agg(F.count("*").alias("n")).collect()
}
print(f"  ingest batch verdicts: {by_status}")

# 3. decontamination report (eval-set n-gram overlap) — binary flag,
# Bloom-prefiltered scale path (identical output), and the graded
# per-doc overlap fraction for threshold policies
contam = decontaminate_ngram(spark, sf_dir)
print(f"  docs flagged by eval-overlap: {contam.count()}")
from metevents_spark.text.pipeline import (
    contamination_fraction,
    decontaminate_bloom,
)

assert decontaminate_bloom(spark, sf_dir).count() == contam.count()
frac = contamination_fraction(spark, sf_dir)
heavy = frac.filter("contaminated_frac > 0.05").count()
print(f"  docs over 5% gram overlap: {heavy}")

# 4. the surviving set -> packed training sequences
survivors = (
    kept.select("doc_id")
    .join(passed.select("doc_id"), "doc_id")
    .join(sampled.select("doc_id"), "doc_id")
    .join(contam.select("doc_id"), "doc_id", "left_anti")
)
n_surv = survivors.count()
packs = sequence_pack(spark, sf_dir)
print(f"survivors into packing: {n_surv}")
print(
    f"packed sequences (whole corpus): {packs.count()} "
    f"(mean fill {packs.agg(F.round(F.avg('fill_ratio'), 3)).collect()[0][0]})"
)

# 4b. tokenizer training on the surviving corpus: learn BPE merges
# distributed, then count real tokens per document
from metevents_spark.text.bpe import bpe_learn, bpe_token_count

merge_table = bpe_learn(spark, sf_dir, n_merges=12)
print(
    "  BPE merges learned: "
    + ", ".join(f"{r['merged']}" for r in merge_table.limit(6).collect())
    + ", ..."
)
tok = bpe_token_count(spark, sf_dir, n_merges=12)
ratio = tok.agg(
    F.round(F.sum("n_tokens_bpe") / F.sum("n_words"), 3)
).collect()[0][0]
print(f"  BPE tokens per word: {ratio}")

# 4c. before weighting sources, measure how far each sits from the
# corpus mix: per-source unigram KL divergence (the drift/weighting
# signal DSIR-style importance weights exponentiate)
from metevents_spark.text.stats import source_token_kl

kl = source_token_kl(spark, sf_dir)
top_kl = kl.orderBy(F.desc("kl_nats")).limit(3).collect()
print(
    "  most corpus-divergent sources: "
    + ", ".join(f"{r['source']} ({r['kl_nats']})" for r in top_kl)
)

# 5. mixture planning: how to sample each source to hit a token budget
from metevents_spark.text.pipeline import mixture_plan

with_tokens = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
    "source", F.size(F.split("text", " ")).alias("n_tokens")
)
srcs = sorted(r.source for r in with_tokens.select("source").distinct().collect())
weights = {s: 1.0 / len(srcs) for s in srcs}  # uniform demo mixture
plan = mixture_plan(with_tokens, weights, target_total_tokens=100_000)
print("  mixture plan (first 3 sources):")
for r in plan.limit(3).collect():
    print(
        f"    {r['source']}: {r['n_tokens']} tokens -> target "
        f"{r['target_tokens']} (rate {r['sampling_rate']}, "
        f"epochs {r['epochs']})"
    )

# 5b. or derive the weights from the corpus itself: alpha-temperature
# sampling (alpha < 1 upweights small sources, the multilingual recipe)
from metevents_spark.text.pipeline import temperature_mixture

tm = temperature_mixture(spark, sf_dir, alpha=0.3, target_total_tokens=100_000)
print("  temperature mixture (first 3 sources):")
for r in tm.limit(3).collect():
    print(
        f"    {r['source']}: share {r['share']} -> weight {r['weight']} "
        f"(epochs {r['epochs']})"
    )

# 5c. domain-targeted selection: importance-resample candidates toward
# the target source's hashed-unigram profile (DSIR recipe)
from metevents_spark.text.pipeline import importance_resample

sel = importance_resample(spark, sf_dir)
print(
    "  DSIR selection (top 3): "
    + ", ".join(
        f"doc {r['doc_id']} (lr {r['log_ratio']})"
        for r in sel.limit(3).collect()
    )
)

# 5d. before trusting the quality gate's threshold at scale: the
# calibration monitor — per-bin confidence vs empirical frequency and
# the expected calibration error (integer ppm; ece_ppm is constant
# across rows)
from metevents_spark.quality import classifier_calibration

cal = classifier_calibration(spark, sf_dir)
rows = cal.collect()
print(f"  calibration: ECE {rows[0]['ece_ppm'] / 1e6:.4f} over {len(rows)} bins")

# 5e. containment screen: docs largely contained in another doc (the
# superset/quote overlap symmetric Jaccard misses) — candidates to drop
# before packing
from metevents_spark.text.dedup import doc_containment

cont = doc_containment(spark, sf_dir)
print(f"  containment pairs (>=50%): {cont.count()}")

# 6. final layout: reproducible global shuffle into training shards
from metevents_spark.text.pipeline import shuffle_shards

shards = shuffle_shards(spark, sf_dir, n_shards=8)
sizes = shards.groupBy("shard").count().orderBy("shard")
print(
    "  shard sizes: "
    + ", ".join(str(r["count"]) for r in sizes.collect())
)
spark.stop()
