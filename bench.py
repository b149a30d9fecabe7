"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Materialization via the noop sink (full column evaluation, no driver
collect, no disk) so timings reflect plan execution, not result
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# every registered query, detector kernels first — the benchmark IS the
# coverage surface (per-query timings recorded by the driver)
HEADLINE = [
    "extreme_value",
    "ann_recall_lsh_ivf",
    "flat_line",
    "extreme_change",
    "data_gap",
    "freq_infer",
    "storm_find",
    "spike_valley",
    "sessionize",
    "daily_rollup",
    "pricing_summary",
    "revenue_topn",
    "region_revenue",
    "shipping_priority",
    "shipmode_priority_counts",
    "top_customers_per_segment",
    "order_priority_check",
    "nation_segment_rollup",
    "brand_revenue",
    "brand_supplier_stats",
    "value_quantiles",
    "value_quantiles_approx",
    "events_pivot",
    "top_price_orders",
    "customers_no_order_1996",
    "big_spender_1995",
    "repeat_customers",
    "churned_customers",
    "small_qty_part_revenue",
    "cumulative_revenue",
    "events_cube",
    "user_reach",
    "user_reach_approx",
    "value_histogram",
    "lineitem_unpivot",
    "price_deciles",
    "asof_purchase_before_error",
    "range_join_error_purchase",
    "rolling_mean",
    "trailing_24h_mean",
    "zscore_anomaly",
    "text_stats",
    "lang_id",
    "token_count_bpe",
    "vocab_top_terms",
    "quality_filter",
    "gopher_quality",
    "url_canonicalize",
    "paragraph_dedup",
    "mixture_plan",
    "temperature_mixture",
    "shuffle_shards",
    "zipf_fit",
    "dedup_recall_report",
    "bpe_learn",
    "bpe_token_count",
    "tfidf_top_terms",
    "doc_fingerprint",
    "rolling_fingerprint",
    "exact_dedup",
    "prefix_dedup",
    "minhash_near_dup",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_near_dup",
    "knn_cosine",
    "knn_lsh",
    "ann_recall_report",
    "knn_ivf",
    "knn_ivf_pq",
    "dedup_clusters",
    "embedding_norms",
    "embedding_near_dup",
    "media_features",
    "frame_sample",
    "media_resize",
    "decontaminate_ngram",
    "decontaminate_bloom",
    "incremental_dedup",
    "importance_resample",
    "boilerplate_phrases",
    "ngram_novelty",
    "event_transitions",
    "top_paths",
    "contamination_fraction",
    "sequence_pack",
    "stratified_sample",
    "source_mix_sample",
    "repetition_stats",
    "label_centroids",
    "funnel_conversion",
    "retention_cohorts",
    "rolling_7d_active",
    "pii_redact",
    "domain_stats",
    "edit_distance_pairs",
    "cross_doc_ngram_share",
    "duplicate_spans",
    "remove_duplicate_spans",
    "unigram_logprob",
    "source_lang_matrix",
    "corpus_summary",
    "props_value_stats",
    "media_dedup",
    "corpus_summary_approx",
    "cooccurrence_counts",
    "robust_zscore",
    "gap_fill_hourly",
    "doc_chunking",
    "event_pair_lift",
    "ewma_smooth",
    "holt_smooth",
    "bigram_logprob",
    "session_overlap",
    "seasonal_anomaly",
    "quality_bucket_sample",
    "value_drift_psi",
    "vocab_top_terms_approx",
    "cusum_alarm",
    "series_trend",
    "series_quantile_bands",
    "embedding_quantize",
    "loyal_customers",
    "nation_revenue_share",
    "data_expectations",
    "nation_trade_flow",
    "min_cost_supplier",
    "important_parts",
    "top_supplier",
    "large_volume_customers",
    "sole_return_supplier",
    "rich_idle_customers",
    "discounted_revenue",
    "returned_item_customers",
    "customer_order_distribution",
    "promo_revenue_pct",
    "disjunctive_part_revenue",
    "heavy_shippers",
    "downsample_ohlc",
    "event_type_corr",
    "corpus_yield",
    "anomaly_consensus",
    "series_acf",
    "classifier_score",
    "bpe_pair_counts",
    "lttb_downsample",
    "semantic_dedup",
    "kmeans_embeddings",
    "seasonal_decompose",
    "latest_event_per_user",
    "winsorize_series",
    "holdout_split",
    "normalize_text",
    "nation_market_share",
    "product_type_profit",
    "random_projection",
    "bm25_rank",
    "part_supplier_counts",
    "hash_sample",
    "media_embedding_near_dup",
    "time_weighted_avg",
    "counter_rate",
    "pareto_parts",
    "embedding_covariance",
    "pca_embeddings",
    "token_entropy",
    "source_token_kl",
    "dominant_part_suppliers",
    "ks_drift",
    "rolling_reach_hll",
    "nation_yoy_growth",
    "embedding_whitening",
    "mad_drift",
    "market_basket_lift",
    "rolling_median",
    "interval_coverage",
    "weighted_sample",
    "user_reach_kmv",
    "key_skew_report",
    "skew_join_compare",
    "holt_backtest",
    "survival_retention",
    "mutual_information",
    "benford_deviation",
    "score_percentile_by_source",
    "source_weighted_sample",
    "interarrival_stats",
    "burst_collapse",
    "region_nation_rollup",
    "region_nations_csv",
    "events_above_type_avg",
    "rrf_fusion",
    "chi2_terms",
    "classifier_calibration",
    "doc_containment",
    "part_pagerank",
    "purchase_attribution",
    "model_select_backtest",
    "ab_test_report",
    "theilsen_trend",
    "theilsen_trend_sampled",
    "spearman_trend",
    "mann_whitney_u",
    "mann_whitney_u_bucketed",
    "revenue_gini",
    "conversion_lag",
    "copurchase_triangles",
    "oov_rate",
    "dedup_survivor_pick",
    "hard_negative_mining",
    "kendall_trend",
    "kendall_trend_sampled",
    "conversion_bootstrap_ci",
    "audience_overlap",
    "ship_delay_quantiles",
    "copurchase_bfs_hops",
    "dedup_rate_by_source",
]


def _cpu_probe(reps: int = 3) -> float:
    """Fixed-work single-thread CPU probe: hash a constant buffer and
    return the best-of-``reps`` wall time. Catches per-core slowdown
    (frequency scaling, steal) that loadavg misses. Best-of keeps one
    GC hiccup from reading as contention."""
    import hashlib

    buf = b"\xa5" * (1 << 20)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        h = buf
        for _ in range(24):
            h = hashlib.sha256(h).digest() + buf
        best = min(best, time.perf_counter() - t0)
    return best


def _cpu_probe_parallel(n_threads: int = 16, reps: int = 2) -> float:
    """Fixed-work MULTI-thread throughput probe: ``n_threads`` threads
    each hash a 1 MB buffer concurrently (hashlib releases the GIL on
    large buffers, so this genuinely exercises n cores). The failure
    mode this catches — measured live on the r10 bench host — is a
    hypervisor CONCURRENCY cap: the single-thread probe stayed flat at
    ~22 ms while 32-thread Spark throughput collapsed ~3x. Only a
    parallel probe can see that."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    buf = b"\xa5" * (1 << 20)

    def work(_):
        h = buf
        for _ in range(24):
            h = hashlib.sha256(h).digest() + buf
        return 0

    best = float("inf")
    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        for _ in range(reps):
            t0 = time.perf_counter()
            list(ex.map(work, range(n_threads)))
            best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Load guard: a bench recorded while the machine is busy is noise,
    # not signal (round 7 committed a baseline with ~25 queries 2-8x
    # "slower" that reproduced at normal speed on an idle machine).
    # Record the 1-min load at start and end; if the START load exceeds
    # the threshold, stamp the run "tainted" and SKIP both the drift
    # comparison and the baseline overwrite so a polluted run can never
    # become the next round's drift-gate reference.
    load_threshold = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "2.0"))
    # Wait-for-quiet (r9): stamping alone still commits a noisy artifact
    # (BENCH_r08.json ran at load 3.33). Sleep-retry until the 1-min
    # load drops under the threshold, bounded by SPARK_GRAFT_QUIET_WAIT
    # seconds (default 300); only if the machine never quiets does the
    # run proceed tainted.
    quiet_wait = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "300"))
    deadline = time.time() + quiet_wait
    load_start = os.getloadavg()[0]
    while load_start > load_threshold and time.time() < deadline:
        print(
            f"waiting for quiet: 1-min load {load_start:.2f} > "
            f"{load_threshold:.1f}",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(15)
        load_start = os.getloadavg()[0]
    tainted = load_start > load_threshold
    if tainted:
        print(
            f"TAINTED: 1-min load {load_start:.2f} > {load_threshold:.1f} "
            f"after waiting {quiet_wait:.0f}s; drift gate and baseline "
            "update disabled for this run",
            file=sys.stderr,
            flush=True,
        )
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    # Size shuffle partitions to the benchmark volume (the standard
    # ~128 MB-per-partition guidance): at sf0.1 every shuffle fits in a
    # handful of partitions, and the iterative/persisted stages
    # (localCheckpoint materialization, cached LSH frames) run at the
    # CONFIGURED count — AQE coalesces plain exchanges but not those —
    # so 32 partitions of near-empty tasks cost ~25% on the dedup
    # family. Explicit SPARK_GRAFT_SHUFFLE still wins, and a larger
    # SF dir should set it proportionally higher.
    os.environ.setdefault(
        "SPARK_GRAFT_SHUFFLE", "8" if 0 < sf <= 0.2 else "32"
    )

    from metevents_spark.session import get_spark
    from metevents_spark.queries import QUERIES

    spark = get_spark(app_name="metevents-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM, codegen, Arrow and parquet footer caches outside the
    # timed region with one representative query per engine path
    # (window+agg native; grouped-map pandas kernel; regex + higher-order
    # lambda codegen on a one-row dummy — compiles the classes, touches
    # no benchmark data)
    QUERIES["flat_line"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    QUERIES["storm_find"](spark, sf_dir).limit(1).write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import functions as F

    from metevents_spark.text.scrub import extract_domains, pii_scrub_columns

    spark.createDataFrame([("x http://a.example.com y",)], ["text"]).select(
        extract_domains(F.col("text")), *pii_scrub_columns(F.col("text"))
    ).write.format("noop").mode("overwrite").save()

    import gc

    # Per query: one cold pass (pays one-time JVM JIT + whole-stage-
    # codegen class compilation for that query's plan), then
    # SPARK_GRAFT_WARM_REPS warm passes of which the MINIMUM is
    # recorded. The warm minimum is the steady-state cost — what a
    # long-running cluster session pays per query, and the number that
    # is comparable across rounds as the registry grows (with ~150
    # distinct plans, single-shot timings are dominated by per-plan
    # compile noise that shifts with registry ordering). The min-of-2
    # exists because measured idle-machine runs still bounce individual
    # heavy Arrow-kernel queries up to 2x on JVM GC state — a
    # single-sample warm time made the drift gate cry wolf two rounds
    # running; the minimum is the estimator least sensitive to that
    # one-sided noise. All passes execute end-to-end against the same
    # sf dir (noop sink = full execution, no result materialization on
    # the driver). `value` is the warm total.
    warm_reps = int(os.environ.get("SPARK_GRAFT_WARM_REPS", "2"))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    # Mid-run contention gate (r10): the start-only loadavg check
    # cannot see contention that begins mid-run, and loadavg DURING the
    # run is dominated by our own executors. Instead, re-run the
    # fixed-work CPU probe between query groups (Spark idle at that
    # instant); a probe > PROBE_SLOW x the start probe means the
    # host's effective CPU speed dropped — taint the run so the noisy
    # numbers can't become the drift baseline.
    probe_every = int(os.environ.get("SPARK_GRAFT_PROBE_EVERY", "20"))
    probe_slow = float(os.environ.get("SPARK_GRAFT_PROBE_SLOW", "1.6"))
    probe_start = _cpu_probe()
    pprobe_start = _cpu_probe_parallel()
    probes: list[float] = [round(probe_start, 4)]
    pprobes: list[float] = [round(pprobe_start, 4)]
    probe_taints: list[str] = []
    for qi, name in enumerate(HEADLINE):
        if probe_every > 0 and qi and qi % probe_every == 0:
            p = _cpu_probe()
            pp = _cpu_probe_parallel()
            probes.append(round(p, 4))
            pprobes.append(round(pp, 4))
            if p > probe_slow * probe_start:
                probe_taints.append(
                    f"after {qi} queries: 1-thread probe {p:.3f}s vs "
                    f"{probe_start:.3f}s at start ({p / probe_start:.2f}x)"
                )
            if pp > probe_slow * pprobe_start:
                probe_taints.append(
                    f"after {qi} queries: parallel probe {pp:.3f}s vs "
                    f"{pprobe_start:.3f}s at start "
                    f"({pp / pprobe_start:.2f}x)"
                )
        fn = QUERIES[name]
        for rep in range(1 + warm_reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            took = round(time.perf_counter() - t0, 3)
            if rep == 0:
                cold[name] = took
            else:
                timings[name] = min(timings.get(name, took), took)
            # outside the timed region: drop the query's DataFrame refs
            # so the ContextCleaner can release its localCheckpoint
            # blocks — across 100 queries the retained blocks otherwise
            # build GC pressure that pollutes later per-query timings
            del df
            gc.collect()

    if probe_taints:
        tainted = True
        for msg in probe_taints:
            print(f"TAINTED mid-run: {msg}", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    cold_total = round(sum(cold.values()), 3)

    # Host-drift normalization (r14, additions-only): round-over-round
    # PERF comparisons have been confounded by sandbox instances whose
    # PARALLEL throughput varies 2-4x while 1-thread probes stay flat
    # (r13 verdict item 1: the r13 run was untainted but on a host with
    # ~1.5x-slower parallel probes, and nothing in the committed JSON
    # let the driver separate code from host). Publish the run's
    # parallel-probe MEDIAN (median, not min: the jitter is one-sided
    # and the bench pays the TYPICAL rate, not the best) plus a
    # probe-normalized warm total: value * (REF / median), where REF is
    # the r12 quiet-host reference band midpoint (BENCH_r12/commit
    # 7b60c63: parallel probes 0.051-0.075 s). Two runs on different
    # hosts then compare on value_probe_normalized; the raw `value`
    # stays the primary metric and is untouched.
    _pp = sorted(pprobes)
    pprobe_median = _pp[len(_pp) // 2] if len(_pp) % 2 else round(
        (_pp[len(_pp) // 2 - 1] + _pp[len(_pp) // 2]) / 2, 4
    )
    pprobe_ref = float(os.environ.get("SPARK_GRAFT_PPROBE_REF", "0.063"))
    value_probe_normalized = (
        round(total * pprobe_ref / pprobe_median, 3)
        if pprobe_median > 0
        else total
    )

    # Commit-able full per-query record + round-over-round drift gate.
    # The driver's stdout tail truncates the per-query dict to the
    # slowest 40, which is why earlier rounds could only compare ~22
    # keys round-over-round; BENCH_FULL_latest.json keeps the COMPLETE
    # warm+cold maps in-repo. Before overwriting, compare against the
    # previous run and flag any query whose warm time exceeded 1.5x its
    # prior warm time (floored at 0.3 s so compile-noise on sub-100 ms
    # plans doesn't page anyone) — a loud line per regression instead
    # of a human diffing two JSON files.
    # SPARK_GRAFT_FULL_OUT redirects the committed full-record path so
    # an off-sf sweep (e.g. the r11 sf1 scale run) cannot clobber the
    # sf0.1 drift baseline
    full_path = os.environ.get("SPARK_GRAFT_FULL_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_FULL_latest.json",
    )
    drift: dict[str, list[float]] = {}
    # Record whether a comparison actually ran: an empty drift map is
    # ambiguous between "compared, no drift" and "baseline missing /
    # recorded at a different sf" — the committed JSON must tell the
    # two apart (prev_sf carries the mismatched sf for the log).
    compared_vs_prev = False
    prev_sf = None
    load_end = os.getloadavg()[0]
    try:
        with open(full_path) as fh:
            prev = json.load(fh)
        prev_warm = prev.get("queries_warm", {})
        prev_sf = prev.get("sf")
        if prev_sf == sf and not tainted and not prev.get("tainted"):
            compared_vs_prev = True
            for name, t in timings.items():
                p = prev_warm.get(name)
                if p is not None and t > max(1.5 * p, 0.3):
                    drift[name] = [p, t]
    except (OSError, ValueError):
        pass
    if not compared_vs_prev:
        if tainted:
            reason = "this run is tainted by machine load"
        elif prev_sf is None:
            reason = "previous BENCH_FULL_latest.json missing/unreadable"
        elif prev_sf != sf:
            reason = (f"previous BENCH_FULL_latest.json recorded at "
                      f"sf={prev_sf}, this run sf={sf}")
        else:
            reason = "previous BENCH_FULL_latest.json is marked tainted"
        print(f"DRIFT baseline skipped: {reason}",
              file=sys.stderr, flush=True)
    for name, (p, t) in sorted(drift.items(), key=lambda kv: -kv[1][1]):
        print(f"DRIFT {name}: warm {p:.3f}s -> {t:.3f}s "
              f"({t / p:.2f}x previous)", file=sys.stderr, flush=True)
    # A tainted run must never become the drift-gate reference: leave
    # the committed baseline untouched and only report this run's
    # numbers on stdout.
    if not tainted:
        try:
            with open(full_path, "w") as fh:
                json.dump(
                    {
                        "metric": "headline_queries_full",
                        "queries_warm": timings,
                        "queries_cold": cold,
                        "drift_vs_prev": drift,
                        "compared_vs_prev": compared_vs_prev,
                        "prev_sf": prev_sf,
                        "total_warm": total,
                        "total_cold": cold_total,
                        "n_queries": len(timings),
                        "sf": sf,
                        "tainted": False,
                        "load_start_1min": round(load_start, 2),
                        "load_end_1min": round(load_end, 2),
                        "cpu_probes": probes,
                        "cpu_probes_parallel": pprobes,
                        "probe_parallel_median": pprobe_median,
                        "probe_parallel_ref": pprobe_ref,
                        "value_probe_normalized": value_probe_normalized,
                    },
                    fh, indent=1, sort_keys=True,
                )
                fh.write("\n")
        except OSError:
            pass
    # Stop Spark BEFORE printing: JVM shutdown can emit trailing log
    # lines, and the driver parses the LAST stdout line as the result.
    spark.stop()
    # Full per-query detail (both passes) on its own line for humans /
    # logs; it is NOT the parsed result line.
    print(
        json.dumps(
            {
                "metric": "headline_queries_detail",
                "queries_warm": timings,
                "queries_cold": cold,
                "sf": sf,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    # The driver records only a bounded (~2000-char) tail of stdout and
    # parses the LAST line as the result, so the final line must stay
    # under that window: with 136 registry queries a full per-query dict
    # is >3 KB and cannot be recovered (r04: "parsed": null). Emit the
    # totals plus the slowest-K warm timings — the perf-relevant subset
    # — and keep the complete dicts on the detail line above.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:40]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "cold_total": cold_total,
                "n_queries": len(timings),
                "queries": slowest,
                "sf": sf,
                "tainted": tainted,
                "load_start_1min": round(load_start, 2),
                "load_end_1min": round(load_end, 2),
                "cpu_probes": probes,
                "cpu_probes_parallel": pprobes,
                "probe_parallel_median": pprobe_median,
                "probe_parallel_ref": pprobe_ref,
                "value_probe_normalized": value_probe_normalized,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
