"""Scale smoke: replicate the sf0.1 events series N-fold (fresh series
ids per copy — scaling the parallelism unit, exactly how 100 TB arrives
as more stations/users, not longer series) and time the core operator
families on the result.

Usage: python tools/scale_smoke.py [factor] [out_json]

Writes the replicated parquet under /tmp and prints one JSON line:
  {"factor": N, "rows": R, "series": S, "ops": {name: {"sec": t,
   "rows_per_sec": r}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
TMP = "/tmp/metevents-scale-smoke"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_path = sys.argv[2] if len(sys.argv) > 2 else ""

    from pyspark.sql import functions as F

    from metevents_spark.io import load_table, series_frame
    from metevents_spark.operators import extreme_value, storm_find
    from metevents_spark.operators.sessions import sessionize
    from metevents_spark.operators.seriesstats import zscore_anomaly
    from metevents_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = f"{TMP}/events_x{factor}"
    if not os.path.isdir(big_dir):
        ev = load_table(spark, BASE, "events")
        copies = spark.range(factor).select(F.col("id").alias("copy"))
        big = ev.crossJoin(copies).select(
            (F.col("user_id") + F.col("copy") * 10_000).alias("user_id"),
            (F.col("event_id") + F.col("copy") * 1_000_000_000).alias("event_id"),
            "ts",
            "event_type",
            "value",
        )
        big.write.mode("overwrite").parquet(big_dir)

    # the smoke reads the replicated parquet through the same loaders
    sf_big = f"{TMP}/sfbig_x{factor}"
    os.makedirs(sf_big, exist_ok=True)
    link = f"{sf_big}/events.parquet"
    if not os.path.exists(link):
        os.symlink(big_dir, link)

    df = series_frame(spark, sf_big)
    rows = df.count()
    series = df.select("sid").distinct().count()

    ops = {
        "extreme_value": lambda: extreme_value(df, 400.0, 1.0),
        "storm_find": lambda: storm_find(
            df, instant_mass_to_start=100.0, min_storm_total=500.0
        ),
        "sessionize": lambda: sessionize(df, gap_s=14400.0),
        "zscore_anomaly": lambda: zscore_anomaly(spark, sf_big),
    }
    results = {}
    for name, fn in ops.items():
        q = fn()
        if q is None:
            continue
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": sec, "rows_per_sec": int(rows / sec)}

    # dedup family over a replicated documents corpus (fresh doc_ids)
    doc_dir = f"{TMP}/documents_x{factor}"
    if not os.path.isdir(doc_dir):
        docs = load_table(spark, BASE, "documents")
        copies = spark.range(factor).select(F.col("id").alias("copy"))
        docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        ).write.mode("overwrite").parquet(doc_dir)
    doc_link = f"{sf_big}/documents.parquet"
    if not os.path.exists(doc_link):
        os.symlink(doc_dir, doc_link)

    from metevents_spark.text import (
        classifier_score,
        exact_dedup,
        minhash_near_dup,
        ngram_jaccard_pairs,
        simhash_fingerprints,
        simhash_near_dup,
        text_stats,
    )
    from metevents_spark.multimodal.media import media_embedding_near_dup
    from metevents_spark.text.dedup import dedup_clusters
    from metevents_spark.text.pipeline import (
        decontaminate_ngram,
        sequence_pack,
        stratified_sample,
    )

    n_docs = load_table(spark, sf_big, "documents").count()
    for name, fn in {
        "exact_dedup": exact_dedup,
        "text_stats": text_stats,
        "simhash_fingerprints": simhash_fingerprints,
        "minhash_near_dup": minhash_near_dup,
        "simhash_near_dup": simhash_near_dup,
        "ngram_jaccard_pairs": ngram_jaccard_pairs,
        "decontaminate_ngram": decontaminate_ngram,
        "sequence_pack": sequence_pack,
        "stratified_sample": stratified_sample,
        "dedup_clusters": dedup_clusters,
        "classifier_score": classifier_score,
        # exact-dedup-first: the replicated corpus is 100 copies per
        # payload, so the LSH/gram stage runs over the SAME 5k distinct
        # payloads as factor 1 — only the member expansion scales
        "media_embedding_near_dup": media_embedding_near_dup,
    }.items():
        t0 = time.perf_counter()
        fn(spark, sf_big).write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": sec, "docs_per_sec": int(n_docs / sec)}

    # similarity family over a replicated embedding corpus (fresh vec_ids)
    emb_dir = f"{TMP}/embeddings_x{factor}"
    if not os.path.isdir(emb_dir):
        emb = load_table(spark, BASE, "embeddings")
        copies = spark.range(factor).select(F.col("id").alias("copy"))
        emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
            "embedding",
            "label",
        ).write.mode("overwrite").parquet(emb_dir)
    emb_link = f"{sf_big}/embeddings.parquet"
    if not os.path.exists(emb_link):
        os.symlink(emb_dir, emb_link)

    from metevents_spark.similarity import (
        embedding_near_dup,
        knn_cosine,
        knn_ivf,
        knn_lsh,
        semantic_dedup,
    )

    n_vecs = load_table(spark, sf_big, "embeddings").count()
    for name, fn in {
        "knn_cosine": knn_cosine,
        "knn_lsh": knn_lsh,
        "knn_ivf": knn_ivf,
        "embedding_near_dup": embedding_near_dup,
        # k grows with corpus so clusters stay bounded — at factor 100
        # (200k vectors) 64 cells keep the within-cluster gram matrices
        # at the few-thousand-vector scale the kernel is sized for
        "semantic_dedup": lambda s, d: semantic_dedup(s, d, k=64, iters=2),
    }.items():
        t0 = time.perf_counter()
        fn(spark, sf_big).write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": sec, "vecs_per_sec": int(n_vecs / sec)}

    out = {
        "factor": factor,
        "rows": rows,
        "series": series,
        "docs": n_docs,
        "vecs": n_vecs,
        "ops": results,
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
