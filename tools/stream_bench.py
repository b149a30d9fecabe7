"""Streaming throughput / soak bench: the scale-evidence counterpart
of bench.py for the streaming tier (r11 verdict item 8).

The batch registry has the 10x sweep (ORACLE_sf1.json / BENCH_sf1);
the 16 streaming kernels had parity + chunking-invariance tests at toy
scale only. This tool replays the REAL sf-dir tables as bounded file
streams through the two stateful paths a pretraining ingest actually
runs — MinHash-LSH dedup-on-ingest over `documents` and a per-series
stateful detector over the canonical `events` frame — and records a
committed throughput + state-size datapoint:

  - rows/s over the whole replay (wall clock from first trigger to
    drain, and the engine's own summed triggerExecution for
    cross-checking),
  - micro-batch count (the replay is chunked so the state store is
    exercised across many triggers, not one big batch),
  - state rows (= keys: LSH buckets / series ids) and state-store
    memoryUsedBytes from StreamingQueryProgress.stateOperators, plus
    the derived bytes/key — the number that decides whether the state
    contract ("O(1) per key", dedup.py / detect.py docstrings) holds
    at ingest scale.

Writes ONE JSON object to STREAM_BENCH.json at the repo root (and
prints it). Run:  python tools/stream_bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_STREAM_CHUNKS (default 16 micro-batch files/table).

At 100 TB: these numbers are per-core-ish local[32] throughput; the
kernels shard by their state key (band/bucket, sid), so cluster
throughput scales with executors until a single key's state breaks
the per-key bound — which is exactly what bytes/key monitors.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chunk_table(pdf, out_dir: str, n_chunks: int) -> int:
    """Write pdf as n_chunks parquet files (the micro-batch replay)."""
    os.makedirs(out_dir)
    n = len(pdf)
    for i in range(n_chunks):
        lo, hi = i * n // n_chunks, (i + 1) * n // n_chunks
        pdf.iloc[lo:hi].to_parquet(
            os.path.join(out_dir, f"chunk{i:04d}.parquet"),
            coerce_timestamps="us",
        )
    return n


def _drain(out_df, ckpt: str) -> dict:
    """Run the streaming query to completion on the noop sink and
    return throughput + state metrics from its progress records."""
    q = (
        out_df.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    t0 = time.perf_counter()
    q.processAllAvailable()
    wall_s = time.perf_counter() - t0
    progresses = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    in_rows = sum(p.get("numInputRows", 0) for p in progresses)
    trig_ms = sum(
        p.get("durationMs", {}).get("triggerExecution", 0)
        for p in progresses
    )
    # the last progress carrying state metrics has the final store size
    state_rows = state_bytes = 0
    for p in progresses:
        for so in p.get("stateOperators", []):
            if so.get("numRowsTotal", 0) or so.get("memoryUsedBytes", 0):
                state_rows = so["numRowsTotal"]
                state_bytes = so["memoryUsedBytes"]
    n_batches = sum(1 for p in progresses if p.get("numInputRows", 0) > 0)
    return {
        "rows": in_rows,
        "wall_s": round(wall_s, 3),
        "rows_per_s": round(in_rows / wall_s, 1) if wall_s > 0 else None,
        "engine_ms": trig_ms,
        "batches": n_batches,
        "state_rows": state_rows,
        "state_bytes": state_bytes,
        "bytes_per_key": (
            round(state_bytes / state_rows, 1) if state_rows else None
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_chunks = int(os.environ.get("SPARK_GRAFT_STREAM_CHUNKS", "16"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    import pandas as pd

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    from metevents_spark.session import get_spark
    from metevents_spark.streaming import stream_minhash_dedup
    from metevents_spark.streaming.detect import stream_zscore

    spark = get_spark(app_name="metevents-spark-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    results: dict[str, dict] = {}
    try:
        # --- pipeline 1: dedup-on-ingest over documents -------------
        docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))[
            ["doc_id", "text"]
        ].sort_values("doc_id")
        _chunk_table(docs, f"{work}/docs_in", n_chunks)
        doc_stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/docs_in")
        )
        results["stream_dedup"] = _drain(
            stream_minhash_dedup(doc_stream, threshold=0.5),
            f"{work}/ckpt_dedup",
        )
        print("stream_dedup:", results["stream_dedup"], file=sys.stderr)

        # --- pipeline 2: stateful detector over the events frame ----
        ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
        ev = (
            ev.assign(sid=ev["user_id"].astype(str), seq=ev["event_id"])
            .loc[:, ["sid", "ts", "value", "seq"]]
            .sort_values(["ts", "seq"])  # arrival order = event time
        )
        _chunk_table(ev, f"{work}/ev_in", n_chunks)
        ev_stream = (
            spark.readStream.schema(
                "sid string, ts timestamp, value double, seq long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/ev_in")
        )
        results["stream_zscore"] = _drain(
            stream_zscore(ev_stream, z_thresh=3.0, min_n=30),
            f"{work}/ckpt_zscore",
        )
        print("stream_zscore:", results["stream_zscore"], file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    record = {
        "metric": "stream_bench",
        "sf": sf,
        "n_chunks": n_chunks,
        "pipelines": results,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STREAM_BENCH.json",
    )
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(record, sort_keys=True))


if __name__ == "__main__":
    main()
