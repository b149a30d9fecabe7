"""Structured Streaming surface: windowed rollups, session windows, and
an incremental stateful storm detector.

The reference is batch-only (SURVEY.md §2.8); this is the streaming
story its semantics map onto: threshold bursts + merge rules become a
keyed stateful operator (``applyInPandasWithState``) whose state is the
*open* suffix of each series — storms are emitted as soon as their
close is provable from data seen so far (a later burst confirms the
dry gap, or the max-duration rule fires), and the buffer is trimmed to
rows after the last emitted stop, so state stays bounded by the active
storm length regardless of stream length.

STATE-SCHEMA EVOLUTION RULE: a kernel's ``*_STATE_SCHEMA`` is the
on-disk layout of every running stream's checkpoint, and this module
unpacks it POSITIONALLY (``... = state.get``). New state fields must
therefore be APPENDED at the end of the struct — inserting mid-struct
silently misaligns every later field on restore. The r11 build broke
this rule when it added the (ts, seq) guard tiebreakers (e.g.
``prev_seq`` landed at position 1 of ``TWA_STATE_SCHEMA``); r12
restores the pre-r11 field prefix with the seq fields appended last.
UPGRADE NOTE: any stream checkpointed on the r11 mid-struct layout
(TWA/BURST/ATTR/CONV/P2 kernels) needs a checkpoint reset when moving
to this layout — the state store schema differs and Spark will refuse
(or misread) the old checkpoint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from metevents_spark.operators.storms import storm_find_numpy

US = 1_000_000


def stream_daily_rollup(stream_df: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 1-day windows per event_type with late-data watermark
    (append-mode safe)."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sessions(
    stream_df: DataFrame, gap: str = "4 hours", watermark: str = "1 day"
) -> DataFrame:
    """Native session windows per user keyed on inactivity gap — the
    streaming dual of operators/sessions.py."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.col("ts"), gap).alias("win"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total"),
        )
        .select(
            F.col("user_id"),
            F.col("win.start").alias("start"),
            F.col("win.end").alias("stop"),
            "n_events",
            "total",
        )
    )


STORM_OUTPUT_SCHEMA = StructType(
    [
        StructField("sid", StringType()),
        StructField("start_us", LongType()),
        StructField("stop_us", LongType()),
        StructField("n_points", LongType()),
        StructField("total", DoubleType()),
    ]
)

STORM_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
        StructField("at_head", LongType()),  # buffer still contains series head
    ]
)


def _closed_storms(
    ts: np.ndarray,
    vals: np.ndarray,
    at_head: bool,
    instant_mass_to_start: float,
    min_storm_total: float,
    hours_to_stop: float,
    max_storm_hours: float,
    tstep_us: int | None,
):
    """Run the batch kernel on the buffer and split its events into
    (provably-closed, still-open). Only the final kernel event can be
    tentative: it may exist only because of the last-burst flush
    (metevents/events.py:114) and could still merge with future bursts.
    A storm is provably closed when data later than
    ``stop + hours_to_stop`` already exists in the buffer."""
    events = storm_find_numpy(
        ts,
        vals,
        instant_mass_to_start=instant_mass_to_start,
        min_storm_total=min_storm_total,
        hours_to_stop=hours_to_stop,
        max_storm_hours=max_storm_hours,
        tstep_us=tstep_us,
    )
    # Suppress the head-extension suppression mismatch: the kernel's
    # "start != first row" check needs the true series head; the buffer
    # preserves it until the first trim (at_head flag) — afterwards every
    # buffered start is mid-series, which is exactly right.
    if not events:
        return [], None
    dt_us = int(hours_to_stop * 3600 * US)
    buf_max = int(ts[-1].astype("datetime64[us]").astype(np.int64))
    closed, open_ev = [], None
    for i, e in enumerate(events):
        stop_us = int(e[1].astype("datetime64[us]").astype(np.int64))
        if i == len(events) - 1 and buf_max - stop_us <= dt_us:
            open_ev = e  # tentative: still inside the dry-out horizon
        else:
            closed.append(e)
    return closed, open_ev


def _advance_storm_buffer(
    prev_state,
    pdf_iter,
    instant_mass_to_start: float,
    min_storm_total: float,
    hours_to_stop: float,
    max_storm_hours: float,
    tstep_us: int | None,
):
    """Per-key incremental step shared by BOTH stateful APIs
    (applyInPandasWithState and transformWithStateInPandas): merge the
    batch's rows into the buffered open suffix, run the batch kernel,
    split provably-closed storms from the tentative tail, and trim the
    buffer past the last emitted stop.

    -> (closed_events, new_state) where new_state is the
    STORM_STATE_SCHEMA tuple (ts_us list, vals list, at_head flag).
    """
    if prev_state is not None:
        ts_us, vals, at_head = prev_state
        ts_buf = list(ts_us)
        val_buf = list(vals)
    else:
        ts_buf, val_buf, at_head = [], [], 1

    for pdf in pdf_iter:
        t = (
            pd.to_datetime(pdf["ts"])
            .astype("datetime64[us]")
            .astype("int64")
            .tolist()
        )
        ts_buf.extend(t)
        val_buf.extend(pdf["value"].astype(float).tolist())

    order = np.argsort(np.asarray(ts_buf, dtype=np.int64), kind="stable")
    ts_arr = np.asarray(ts_buf, dtype=np.int64)[order].astype("datetime64[us]")
    val_arr = np.asarray(val_buf, dtype=np.float64)[order]

    closed, _open_ev = _closed_storms(
        ts_arr,
        val_arr,
        bool(at_head),
        instant_mass_to_start,
        min_storm_total,
        hours_to_stop,
        max_storm_hours,
        tstep_us,
    )

    if closed:
        # trim buffer to rows after the last closed storm's stop —
        # bounded state — and remember we dropped the head
        last_stop = closed[-1][1]
        keep = ts_arr > last_stop
        ts_arr = ts_arr[keep]
        val_arr = val_arr[keep]
        at_head = 0
    new_state = (
        ts_arr.astype("int64").tolist(),
        val_arr.tolist(),
        int(at_head),
    )
    return closed, new_state


def _closed_frame(sid, closed) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "sid": [sid] * len(closed),
            "start_us": [
                int(e[0].astype("datetime64[us]").astype(np.int64))
                for e in closed
            ],
            "stop_us": [
                int(e[1].astype("datetime64[us]").astype(np.int64))
                for e in closed
            ],
            "n_points": [e[3] for e in closed],
            "total": [e[2] for e in closed],
        }
    )


def stream_storm_find(
    stream_df: DataFrame,
    instant_mass_to_start: float = 0.1,
    min_storm_total: float = 0.5,
    hours_to_stop: float = 24,
    max_storm_hours: float = 336,
    tstep_us: int | None = None,
) -> DataFrame:
    """Incremental storm detection over a streaming canonical frame
    (sid, ts, value). Emits each storm exactly once, as soon as its
    close is provable. Use ``ts_micros(start_us)`` downstream to get
    timestamps (kept as long for a stable Arrow state schema)."""

    def fn(key, pdf_iter, state: GroupState):
        (sid,) = key
        closed, new_state = _advance_storm_buffer(
            state.get if state.exists else None,
            pdf_iter,
            instant_mass_to_start,
            min_storm_total,
            hours_to_stop,
            max_storm_hours,
            tstep_us,
        )
        state.update(new_state)
        if closed:
            yield _closed_frame(sid, closed)

    return (
        stream_df.select(
            F.col("sid"), F.col("ts"), F.col("value").cast("double")
        )
        .groupBy("sid")
        .applyInPandasWithState(
            fn,
            STORM_OUTPUT_SCHEMA,
            STORM_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_storm_find_tws(
    stream_df: DataFrame,
    instant_mass_to_start: float = 0.1,
    min_storm_total: float = 0.5,
    hours_to_stop: float = 24,
    max_storm_hours: float = 336,
    tstep_us: int | None = None,
) -> DataFrame:
    """Storm detection on Spark 4's ``transformWithStateInPandas`` —
    the forward-compatible stateful surface (SPARK-45939, the successor
    to applyInPandasWithState). Same per-key step and emit-once
    semantics as stream_storm_find; the buffer lives in a ValueState
    backed by the RocksDB state store (the session must set
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider — transformWithState requires it).

    The transformWithState Python worker speaks a protobuf protocol to
    the JVM; where ``google.protobuf`` is not installed the query
    would die at runtime inside the worker, so this entry point falls
    back to the applyInPandasWithState engine (identical per-key step,
    state contents, and output schema — only the state-store surface
    differs) with a warning rather than failing."""
    import importlib.util
    import warnings

    try:
        have_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no parent 'google' package at all
        have_protobuf = False
    if not have_protobuf:
        warnings.warn(
            "transformWithStateInPandas needs google.protobuf, which is "
            "not installed; falling back to the applyInPandasWithState "
            "storm engine (same semantics and output schema)",
            RuntimeWarning,
            stacklevel=2,
        )
        return stream_storm_find(
            stream_df,
            instant_mass_to_start=instant_mass_to_start,
            min_storm_total=min_storm_total,
            hours_to_stop=hours_to_stop,
            max_storm_hours=max_storm_hours,
            tstep_us=tstep_us,
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class StormProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._buf = handle.getValueState("storm_buf", STORM_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (sid,) = key
            closed, new_state = _advance_storm_buffer(
                self._buf.get() if self._buf.exists() else None,
                rows,
                instant_mass_to_start,
                min_storm_total,
                hours_to_stop,
                max_storm_hours,
                tstep_us,
            )
            self._buf.update(new_state)
            if closed:
                yield _closed_frame(sid, closed)

        def close(self) -> None:
            pass

    return (
        stream_df.select(
            F.col("sid"), F.col("ts"), F.col("value").cast("double")
        )
        .groupBy("sid")
        .transformWithStateInPandas(
            statefulProcessor=StormProcessor(),
            outputStructType=STORM_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


def stream_dedup(
    stream_df: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact deduplication: keep the first arrival of each
    key, with state bounded by the watermark horizon
    (``dropDuplicatesWithinWatermark`` — late duplicates beyond the
    watermark age out of state instead of growing it forever, the only
    viable contract for an unbounded 100 TB/day stream)."""
    keys = key_cols or ["event_id"]
    return stream_df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def _sort_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic micro-batch order for the incremental folds: by
    (ts, seq) when the stream carries a seq/ingest-order column, by ts
    alone otherwise — always a STABLE sort, so equal timestamps keep
    their arrival order instead of folding in quicksort-nondeterministic
    order (the batch counterparts order by (ts, seq); see
    operators/changepoint.py:45)."""
    keys = ["ts", "seq"] if "seq" in pdf.columns else ["ts"]
    return pdf.sort_values(keys, kind="stable")


def _clean_series_cols(stream_df: DataFrame) -> list:
    """(sid, ts, value[, seq]) projection for the per-series folds;
    seq rides along as the order tiebreaker when the source has it."""
    cols = [F.col("sid"), F.col("ts"), F.col("value").cast("double")]
    if "seq" in stream_df.columns:
        cols.append(F.col("seq"))
    return cols


ZSCORE_OUTPUT_SCHEMA = "sid string, ts timestamp, value double, z double"
ZSCORE_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s1", DoubleType()),
        StructField("s2", DoubleType()),
    ]
)


def _advance_zscore(
    state: tuple | None,
    pdf_iter,
    z_thresh: float,
    min_n: int,
):
    """Prior-history z-score step: each point is scored against the
    running mean/std of everything BEFORE it, then folded into the
    state — so the verdict on a point never depends on how the stream
    was chunked into micro-batches (the chunking-invariance property
    test pins this). Vectorized per batch: prefix sums shifted by one
    give every row its prior (n, sum, sumsq) in one numpy pass.
    """
    import numpy as np

    n0, s1_0, s2_0 = state if state is not None else (0, 0.0, 0.0)
    out = []
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        pdf = _sort_batch(pdf)
        v = pdf["value"].to_numpy(dtype=np.float64)
        k = len(v)
        n_prior = n0 + np.arange(k, dtype=np.int64)
        s1_prior = s1_0 + np.concatenate(([0.0], np.cumsum(v)[:-1]))
        s2_prior = s2_0 + np.concatenate(([0.0], np.cumsum(v * v)[:-1]))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s1_prior / n_prior
            var = (s2_prior - s1_prior * s1_prior / n_prior) / (n_prior - 1)
            sd = np.sqrt(np.maximum(var, 0.0))
            z = (v - mean) / sd
        ok = (n_prior >= min_n) & (sd > 0) & (np.abs(z) > z_thresh)
        if ok.any():
            hit = pdf.iloc[np.flatnonzero(ok)]
            out.append(
                pd.DataFrame(
                    {
                        "sid": hit["sid"].to_numpy(),
                        "ts": hit["ts"].to_numpy(),
                        "value": v[ok],
                        "z": np.round(z[ok], 6),
                    }
                )
            )
        n0 += k
        s1_0 += float(v.sum())
        s2_0 += float((v * v).sum())
    return out, (n0, s1_0, s2_0)


def stream_zscore(
    stream_df: DataFrame,
    z_thresh: float = 3.0,
    min_n: int = 30,
) -> DataFrame:
    """Streaming z-score anomalies: the incremental counterpart of
    ``zscore_anomaly`` (operators/seriesstats.py). State per series is
    THREE numbers (count, sum, sum-of-squares) — constant regardless
    of stream length, no watermark needed. Sum-of-squares running
    variance is numerically fine at sensor value magnitudes; a
    Welford rewrite drops in behind the same state schema if inputs
    ever reach 1e8+.
    """

    def fn(key, pdf_iter, state: GroupState):
        (sid,) = key
        prior = tuple(state.get) if state.exists else None
        frames, new_state = _advance_zscore(prior, pdf_iter, z_thresh, min_n)
        state.update(new_state)
        for f in frames:
            yield f

    return (
        stream_df.select(*_clean_series_cols(stream_df))
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("sid")
        .applyInPandasWithState(
            fn,
            ZSCORE_OUTPUT_SCHEMA,
            ZSCORE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_OUTPUT_SCHEMA = (
    "sid string, ts timestamp, value double, s_pos double, s_neg double"
)
CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s1", DoubleType()),
        StructField("s2", DoubleType()),
        StructField("cp", DoubleType()),
        StructField("cpmin", DoubleType()),
        StructField("cn", DoubleType()),
        StructField("cnmin", DoubleType()),
    ]
)


def _advance_cusum(
    state: tuple | None,
    pdf_iter,
    h: float,
    min_n: int,
    slack: float = 0.5,
):
    """Two-sided CUSUM step with prior-history standardization: each
    point's z-score uses the running mean/std of everything BEFORE it
    (chunking-invariant, like ``_advance_zscore``). Each side folds
    z -/+ slack into its cumulative path; the statistic is
    path - running_min(path) (the closed form of
    ``max(0, S + z - k)``), so the slack absorbs stationary noise and
    only sustained shifts accumulate. State is seven numbers per
    series. Vectorized: shifted prefix sums for the prior stats,
    cumsum for the paths, minimum.accumulate for the extrema.
    """
    import numpy as np

    n0, s1_0, s2_0, cp0, cpmin0, cn0, cnmin0 = (
        state if state is not None else (0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    )
    out = []
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        pdf = _sort_batch(pdf)
        v = pdf["value"].to_numpy(dtype=np.float64)
        k = len(v)
        n_prior = n0 + np.arange(k, dtype=np.int64)
        s1_prior = s1_0 + np.concatenate(([0.0], np.cumsum(v)[:-1]))
        s2_prior = s2_0 + np.concatenate(([0.0], np.cumsum(v * v)[:-1]))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s1_prior / n_prior
            var = (s2_prior - s1_prior * s1_prior / n_prior) / (n_prior - 1)
            sd = np.sqrt(np.maximum(var, 0.0))
            z = (v - mean) / sd
        live = (n_prior >= min_n) & (sd > 0)
        dp = np.where(live, z - slack, 0.0)
        dn = np.where(live, -z - slack, 0.0)
        cp = cp0 + np.cumsum(dp)
        cn = cn0 + np.cumsum(dn)
        cpmin = np.minimum(cpmin0, np.minimum.accumulate(cp))
        cnmin = np.minimum(cnmin0, np.minimum.accumulate(cn))
        s_pos = cp - cpmin
        s_neg = cn - cnmin
        ok = (s_pos > h) | (s_neg > h)
        if ok.any():
            hit = pdf.iloc[np.flatnonzero(ok)]
            out.append(
                pd.DataFrame(
                    {
                        "sid": hit["sid"].to_numpy(),
                        "ts": hit["ts"].to_numpy(),
                        "value": v[ok],
                        "s_pos": np.round(s_pos[ok], 6),
                        "s_neg": np.round(s_neg[ok], 6),
                    }
                )
            )
        n0 += k
        s1_0 += float(v.sum())
        s2_0 += float((v * v).sum())
        cp0, cpmin0 = float(cp[-1]), float(cpmin[-1])
        cn0, cnmin0 = float(cn[-1]), float(cnmin[-1])
    return out, (n0, s1_0, s2_0, cp0, cpmin0, cn0, cnmin0)


def stream_cusum(
    stream_df: DataFrame,
    h: float = 5.0,
    min_n: int = 30,
) -> DataFrame:
    """Streaming CUSUM mean-shift alarms: the incremental counterpart
    of the batch ``cusum_alarm`` (operators/changepoint.py). State per
    series is SEVEN numbers — running count/sum/sumsq for the
    standardizer plus each side's cumulative path value and running
    minimum — constant regardless of stream length, no watermark
    needed. NULL/NaN values are filtered up front like the batch
    operator: one NaN reaching the numpy fold would make every later
    cumulative sum (and so every future alarm) NaN for that series."""

    def fn(key, pdf_iter, state: GroupState):
        (sid,) = key
        prior = tuple(state.get) if state.exists else None
        frames, new_state = _advance_cusum(prior, pdf_iter, h, min_n)
        state.update(new_state)
        for f in frames:
            yield f

    return (
        stream_df.select(*_clean_series_cols(stream_df))
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("sid")
        .applyInPandasWithState(
            fn,
            CUSUM_OUTPUT_SCHEMA,
            CUSUM_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


HOLT_OUTPUT_SCHEMA = (
    "sid string, ts timestamp, value double, level double, trend double"
)
HOLT_STATE_SCHEMA = StructType(
    [
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
    ]
)


def _advance_holt(
    state: tuple | None,
    pdf_iter,
    alpha: float,
    beta: float,
):
    """Holt double-exponential step: fold each batch's rows in (ts,
    seq) order through the two-state level/trend recurrence

        l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}

    seeded l_0 = x_0, b_0 = 0 — exactly the batch ``holt_smooth``
    recursion, so batch/stream parity is a row-for-row equality and
    the verdict on a point never depends on how the stream was
    chunked (the carried state IS the whole history)."""
    l, b = state if state is not None else (None, None)
    out = []
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        pdf = _sort_batch(pdf)
        v = pdf["value"].to_numpy(dtype=np.float64)
        lv = np.empty(len(v))
        tr = np.empty(len(v))
        for i in range(len(v)):
            if l is None:
                l, b = float(v[i]), 0.0
            else:
                prev = l
                l = alpha * float(v[i]) + (1.0 - alpha) * (l + b)
                b = beta * (l - prev) + (1.0 - beta) * b
            lv[i] = l
            tr[i] = b
        out.append(
            pd.DataFrame(
                {
                    "sid": pdf["sid"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "value": v,
                    "level": np.round(lv, 6),
                    "trend": np.round(tr, 6),
                }
            )
        )
    return out, (l, b)


def stream_holt(
    stream_df: DataFrame,
    alpha: float = 0.2,
    beta: float = 0.1,
) -> DataFrame:
    """Streaming Holt smoothing: the incremental counterpart of the
    batch ``holt_smooth`` (operators/seriesstats.py). State per series
    is TWO numbers (level, trend) — constant regardless of stream
    length, no watermark needed. NULL/NaN values are filtered up front
    like the other streaming detectors (the batch operator instead
    emits carried state on dirty rows — the one documented divergence)."""

    def fn(key, pdf_iter, state: GroupState):
        (sid,) = key
        prior = tuple(state.get) if state.exists else None
        frames, new_state = _advance_holt(prior, pdf_iter, alpha, beta)
        state.update(new_state)
        for f in frames:
            yield f

    return (
        stream_df.select(*_clean_series_cols(stream_df))
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("sid")
        .applyInPandasWithState(
            fn,
            HOLT_OUTPUT_SCHEMA,
            HOLT_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_ohlc(stream_df: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming daily OHLC bars per series: the watermarked dual of
    the batch ``downsample_ohlc`` (operators/seriesstats.py). Pure
    declarative windowed aggregation — ``min_by``/``max_by`` pick the
    open/close inside the tumbling window with the same (ts[, seq])
    ordering key as the batch operator, so once a window closes the
    emitted bar equals the batch bar over the same rows (asserted in
    tests). Append-mode safe: a bar emits exactly once, when the
    watermark passes its window end. NULL/NaN values are dropped like
    the batch operator."""
    cols = _clean_series_cols(stream_df)
    has_seq = "seq" in stream_df.columns
    ord_key = F.struct("ts", "seq") if has_seq else F.col("ts")
    return (
        stream_df.select(*cols)
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .withWatermark("ts", watermark)
        .groupBy("sid", F.window("ts", "1 day").alias("win"))
        .agg(
            F.min_by("value", ord_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ord_key).alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            "sid",
            F.col("win.start").alias("day"),
            "open",
            "high",
            "low",
            "close",
            "n_obs",
        )
    )


COUNTER_OUTPUT_SCHEMA = (
    "sid string, ts timestamp, value double, n_points long, resets long,"
    " increase double, rate_per_hour double"
)
COUNTER_STATE_SCHEMA = StructType(
    [
        StructField("last_v", DoubleType()),
        StructField("n", LongType()),
        StructField("resets", LongType()),
        StructField("inc", DoubleType()),  # UNROUNDED running increase
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def stream_counter_rate(stream_df: DataFrame) -> DataFrame:
    """Streaming reset-aware counter rate: the incremental counterpart
    of the batch ``counter_rate`` (operators/seriesstats.py). Each
    arriving reading emits the series' RUNNING aggregate — points,
    resets, accumulated increase, increase-per-hour over the observed
    span — so the LAST emitted row per series equals the batch
    operator's row exactly (same reset-delta algebra, same rounding
    order: the rate divides the ROUNDED increase like the batch
    select does). rate_per_hour is NULL until the series has >= 2
    points and a positive span, mirroring the batch HAVING filter.

    State per series is SIX numbers — constant for any stream length,
    no watermark needed. NULL/NaN readings are filtered up front like
    the batch operator (a NULL bridges its neighbors). Chunking
    invariance holds because the carried state is the whole history.
    Ordering contract: per-series event time must be non-decreasing
    ACROSS micro-batches (within a batch we sort). An out-of-order
    point would compare against the wrong neighbor (fake reset) and
    shrink the observed span — if the source can deliver late data,
    sort/stage it upstream or use the batch operator on the replayed
    log.
    """

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            last_v, n, resets, inc, first_us, last_us = state.get
        else:
            last_v, n, resets, inc, first_us, last_us = (
                None, 0, 0, 0.0, None, None,
            )
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = _sort_batch(pdf)
            v = pdf["value"].to_numpy(dtype=np.float64)
            us = (
                pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            )
            rows_n = np.empty(len(v), dtype=np.int64)
            rows_r = np.empty(len(v), dtype=np.int64)
            rows_i = np.empty(len(v))
            rows_rate = np.full(len(v), np.nan)
            for i in range(len(v)):
                x = float(v[i])
                if last_v is not None:
                    if x < last_v:
                        resets += 1
                        inc += x
                    else:
                        inc += x - last_v
                last_v = x
                n += 1
                if first_us is None:
                    first_us = int(us[i])
                last_us = int(us[i])
                rows_n[i] = n
                rows_r[i] = resets
                rows_i[i] = round(inc, 6)
                span_h = (last_us - first_us) / 3.6e9
                if n >= 2 and span_h > 0:
                    rows_rate[i] = round(round(inc, 6) / span_h, 6)
            yield pd.DataFrame(
                {
                    "sid": pdf["sid"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "value": v,
                    "n_points": rows_n,
                    "resets": rows_r,
                    "increase": rows_i,
                    "rate_per_hour": rows_rate,
                }
            )
        state.update((last_v, n, resets, inc, first_us, last_us))

    return (
        stream_df.select(*_clean_series_cols(stream_df))
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("sid")
        .applyInPandasWithState(
            fn,
            COUNTER_OUTPUT_SCHEMA,
            COUNTER_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


TWA_OUTPUT_SCHEMA = (
    "sid string, bucket_day timestamp, n_segments long, twa double,"
    " simple_avg double"
)
TWA_STATE_SCHEMA = StructType(
    [
        StructField("prev_us", LongType()),
        StructField("prev_v", DoubleType()),
        StructField("open_day_us", LongType()),
        StructField("n_seg", LongType()),
        StructField("sum_dt", DoubleType()),
        StructField("sum_mass", DoubleType()),
        StructField("sum_v", DoubleType()),
        StructField("n_late", LongType()),  # dropped out-of-order points
        # (ts, seq) guard tiebreaker — APPENDED last (state-schema
        # evolution rule: new fields go at the END so an existing
        # checkpoint's positional layout keeps its meaning; the r11
        # build inserted this mid-struct, so streams checkpointed on
        # the r11 layout need a checkpoint reset when upgrading)
        StructField("prev_seq", LongType()),
    ]
)

_DAY_US = 86_400 * 1_000_000


def stream_time_weighted(stream_df: DataFrame) -> DataFrame:
    """Streaming trapezoidal time-weighted daily mean: the incremental
    counterpart of the batch ``time_weighted_avg``
    (operators/seriesstats.py). Segments form between consecutive
    clean readings exactly as in batch (a segment belongs to the day
    of its LATER endpoint); a day's row is emitted when the first
    segment of a LATER day arrives — the same provably-closed contract
    as ``stream_storm_find``: every emitted day is final, the
    currently-open day is withheld until a later-day segment proves it
    complete. Days whose segments all have zero duration drop, like
    the batch HAVING filter.

    Replaying a static corpus yields exactly the batch rows for every
    series-day except each series' LAST (still-open) day — pinned by
    pytest together with chunking-invariance. State per series is
    NINE numbers. Ordering contract: points are sorted within each
    micro-batch by (ts, seq), and the same lexicographic order is
    enforced ACROSS micro-batches — a point strictly before the
    previous processed (ts, seq) is out of order —
    it would form a negative-duration segment whose negative trapezoid
    mass (possibly belonging to an already-emitted day) would corrupt
    the open day's twa. Such points are DROPPED and counted in the
    ``n_late`` state slot (observability; never silently folded).
    Equal timestamps (dt = 0) keep batch semantics: the segment counts
    but adds no mass. Late data ON TIME ORDER within the open day
    still folds exactly; emitted days are final.
    """

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            (prev_us, prev_v, open_day, n_seg, s_dt, s_mass,
             s_v, n_late, prev_seq) = state.get
        else:
            (prev_us, prev_v, open_day, n_seg, s_dt, s_mass,
             s_v, n_late, prev_seq) = (None, None, None, 0, 0.0, 0.0, 0.0,
                                       0, None)
        out_sid, out_day, out_n, out_twa, out_avg = [], [], [], [], []

        def close_day():
            if s_dt > 0:
                out_sid.append(key[0])
                out_day.append(open_day)
                out_n.append(n_seg)
                out_twa.append(round(s_mass / s_dt, 6))
                out_avg.append(round(s_v / n_seg, 6))

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = _sort_batch(pdf)
            v = pdf["value"].to_numpy(dtype=np.float64)
            us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            # seq rides along when the source has it; sources without
            # one degrade to the ts-only guard (q fixed at 0)
            sq = (
                pdf["seq"].to_numpy(dtype="int64")
                if "seq" in pdf.columns
                else None
            )
            for i in range(len(v)):
                x, u = float(v[i]), int(us[i])
                q = int(sq[i]) if sq is not None else 0
                # full (ts, seq) lexicographic guard — see
                # stream_burst_collapse (r11 fix; was ts-only)
                if prev_us is not None and (u, q) < (prev_us, prev_seq):
                    n_late += 1
                    continue
                if prev_us is not None:
                    dt = float(u - prev_us)
                    seg_day = (u // _DAY_US) * _DAY_US
                    if open_day is None:
                        open_day = seg_day
                    elif seg_day > open_day:
                        close_day()
                        open_day = seg_day
                        n_seg, s_dt, s_mass, s_v = 0, 0.0, 0.0, 0.0
                    n_seg += 1
                    s_dt += dt
                    s_mass += (prev_v + x) / 2.0 * dt
                    s_v += x
                prev_us, prev_seq, prev_v = u, q, x
        state.update(
            (prev_us, prev_v, open_day, n_seg, s_dt, s_mass,
             s_v, n_late, prev_seq)
        )
        if out_sid:
            yield pd.DataFrame(
                {
                    "sid": out_sid,
                    "bucket_day": pd.to_datetime(
                        np.asarray(out_day, dtype="int64"), unit="us"
                    ),
                    "n_segments": np.asarray(out_n, dtype="int64"),
                    "twa": out_twa,
                    "simple_avg": out_avg,
                }
            )

    return (
        stream_df.select(*_clean_series_cols(stream_df))
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("sid")
        .applyInPandasWithState(
            fn,
            TWA_OUTPUT_SCHEMA,
            TWA_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


BURST_OUTPUT_SCHEMA = (
    "sid string, event_type string, first_ts timestamp, first_seq long,"
    " n_collapsed long, span_us long"
)
BURST_STATE_SCHEMA = StructType(
    [
        StructField("first_us", LongType()),
        StructField("first_seq", LongType()),
        StructField("n", LongType()),
        StructField("last_us", LongType()),
        StructField("n_late", LongType()),  # dropped out-of-order points
        # (ts, seq) guard tiebreaker — appended last; see TWA_STATE_SCHEMA
        StructField("last_seq", LongType()),
    ]
)


def stream_burst_collapse(
    stream_df: DataFrame, refractory_minutes: int = 30
) -> DataFrame:
    """Streaming telemetry debounce: the incremental counterpart of the
    batch ``burst_collapse`` (operators/sessions.py). A burst of
    same-type events per user CLOSES — and emits exactly once — when a
    later same-type event arrives more than ``refractory_minutes``
    after the burst's last member; the currently-open burst is
    withheld (the stream_storm_find provably-closed contract, so
    replaying a static corpus yields exactly the batch rows minus each
    (user, type)'s LAST burst — pytest-pinned with chunking
    invariance).

    State per (user, type) is FIVE numbers. Ordering contract: within
    a micro-batch points are sorted; across micro-batches an event
    older than the group's last processed point would splice into an
    already-summarized burst, so it is DROPPED and counted in the
    ``n_late`` state slot (the round-9 out-of-order policy shared with
    stream_time_weighted).
    """
    gap_us = refractory_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            first_us, first_seq, n, last_us, n_late, last_seq = state.get
        else:
            first_us, first_seq, n, last_us, n_late, last_seq = (
                None, None, 0, None, 0, None,
            )
        out = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = _sort_batch(pdf)
            us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            seqs = pdf["seq"].to_numpy(dtype="int64")
            for i in range(len(us)):
                u, q = int(us[i]), int(seqs[i])
                # full (ts, seq) lexicographic guard: the batch
                # counterpart's total order, enforced ACROSS chunks —
                # an equal-ts lower-seq event in a later micro-batch
                # is late, not acceptable (r11 fix; was ts-only)
                if last_us is not None and (u, q) < (last_us, last_seq):
                    n_late += 1
                    continue
                if first_us is None:
                    first_us, first_seq, n, last_us, last_seq = u, q, 1, u, q
                elif u - last_us > gap_us:
                    out.append(
                        (key[0], key[1], first_us, first_seq, n,
                         last_us - first_us)
                    )
                    first_us, first_seq, n, last_us, last_seq = u, q, 1, u, q
                else:
                    n += 1
                    # the batch operator's MIN(seq) over the burst
                    first_seq = min(first_seq, q)
                    last_us, last_seq = u, q
        state.update((first_us, first_seq, n, last_us, n_late, last_seq))
        if out:
            yield pd.DataFrame(
                {
                    "sid": [r[0] for r in out],
                    "event_type": [r[1] for r in out],
                    "first_ts": pd.to_datetime(
                        np.asarray([r[2] for r in out], dtype="int64"),
                        unit="us",
                    ),
                    "first_seq": np.asarray(
                        [r[3] for r in out], dtype="int64"
                    ),
                    "n_collapsed": np.asarray(
                        [r[4] for r in out], dtype="int64"
                    ),
                    "span_us": np.asarray(
                        [r[5] for r in out], dtype="int64"
                    ),
                }
            )

    return (
        stream_df.select("sid", "seq", "event_type", "ts")
        .groupBy("sid", "event_type")
        .applyInPandasWithState(
            fn,
            BURST_OUTPUT_SCHEMA,
            BURST_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


ATTR_OUTPUT_SCHEMA = (
    "sid string, purchase_id long, purchase_ts timestamp,"
    " touch_id long, touch_type string, gap_us long"
)
ATTR_STATE_SCHEMA = StructType(
    [
        StructField("t_us", LongType()),
        StructField("t_id", LongType()),
        StructField("t_type", StringType()),
        StructField("last_us", LongType()),
        StructField("n_late", LongType()),  # dropped out-of-order points
        # (ts, seq) guard tiebreaker — appended last; see TWA_STATE_SCHEMA
        StructField("last_seq", LongType()),
    ]
)


def stream_purchase_attribution(
    stream_df: DataFrame, lookback_days: int = 7
) -> DataFrame:
    """Streaming last-touch attribution: the incremental counterpart of
    the batch ``purchase_attribution`` (relational/product.py). Every
    arriving purchase emits its attribution row IMMEDIATELY — the
    credit depends only on events already seen, so nothing is withheld
    and a static-corpus replay equals the batch result EXACTLY (not
    minus a tail — pytest-pinned with chunking invariance).

    State per user is the last non-purchase touch (epoch, id, type)
    plus the out-of-order guard — FOUR numbers and a string, O(1)
    regardless of stream length. Ordering contract: within a
    micro-batch points sort by (ts, seq); an event older than the
    user's last processed point is DROPPED and counted in ``n_late``
    (the shared round-9 policy — splicing it in would rewrite an
    attribution already emitted downstream).
    """
    lb_us = lookback_days * 86_400_000_000

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            t_us, t_id, t_type, last_us, n_late, last_seq = state.get
        else:
            t_us, t_id, t_type, last_us, n_late, last_seq = (
                None, None, None, None, 0, None,
            )
        out = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = _sort_batch(pdf)
            us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            seqs = pdf["seq"].to_numpy(dtype="int64")
            types = pdf["event_type"].to_numpy()
            for i in range(len(us)):
                u, q, ty = int(us[i]), int(seqs[i]), str(types[i])
                # full (ts, seq) lexicographic guard — see
                # stream_burst_collapse (r11 fix; was ts-only)
                if last_us is not None and (u, q) < (last_us, last_seq):
                    n_late += 1
                    continue
                last_us, last_seq = u, q
                if ty != "purchase":
                    t_us, t_id, t_type = u, q, ty
                    continue
                if t_us is not None and u - t_us <= lb_us:
                    out.append((key[0], q, u, t_id, t_type, u - t_us))
                else:
                    out.append((key[0], q, u, None, None, None))
        state.update((t_us, t_id, t_type, last_us, n_late, last_seq))
        if out:
            yield pd.DataFrame(
                {
                    "sid": [r[0] for r in out],
                    "purchase_id": np.asarray(
                        [r[1] for r in out], dtype="int64"
                    ),
                    "purchase_ts": pd.to_datetime(
                        np.asarray([r[2] for r in out], dtype="int64"),
                        unit="us",
                    ),
                    "touch_id": pd.array(
                        [r[3] for r in out], dtype="Int64"
                    ),
                    "touch_type": [r[4] for r in out],
                    "gap_us": pd.array([r[5] for r in out], dtype="Int64"),
                }
            )

    return (
        stream_df.select("sid", "seq", "event_type", "ts")
        .groupBy("sid")
        .applyInPandasWithState(
            fn,
            ATTR_OUTPUT_SCHEMA,
            ATTR_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


CONV_OUTPUT_SCHEMA = (
    "sid string, signup_ts timestamp, purchase_ts timestamp, lag_us long"
)
CONV_STATE_SCHEMA = StructType(
    [
        StructField("signup_us", LongType()),
        StructField("converted", LongType()),  # 0/1 — emit-once latch
        StructField("last_us", LongType()),
        StructField("n_late", LongType()),  # dropped out-of-order points
        # (ts, seq) guard tiebreaker — appended last; see TWA_STATE_SCHEMA
        StructField("last_seq", LongType()),
    ]
)


def stream_conversion_lag(stream_df: DataFrame) -> DataFrame:
    """Streaming signup→purchase conversion latency: the incremental
    counterpart of the batch ``conversion_lag`` (relational/product.py).
    The moment a user's FIRST purchase at-or-after their FIRST signup
    arrives, ONE row emits with the exact integer-microsecond lag —
    the real-time activation metric (time-to-convert percentiles over
    this stream feed launch dashboards without rescanning history).

    State per user is three epoch numbers and a latch — O(1) forever:
    first signup micros, the converted flag (emit-once), the
    out-of-order guard, and the late-drop counter. A static-corpus
    replay equals the batch result EXACTLY (conversion depends only on
    past events, nothing is withheld) under any chunking —
    pytest-pinned. Ordering contract: within a micro-batch points sort
    by (ts, seq); an event older than the user's last processed point
    drops into ``n_late`` (the shared round-9 policy — a late signup
    cannot retract an emitted conversion).
    """

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            signup_us, converted, last_us, n_late, last_seq = state.get
        else:
            signup_us, converted, last_us, n_late, last_seq = (
                None, 0, None, 0, None,
            )
        out = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = _sort_batch(pdf)
            us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            seqs = pdf["seq"].to_numpy(dtype="int64")
            types = pdf["event_type"].to_numpy()
            for i in range(len(us)):
                u, q, ty = int(us[i]), int(seqs[i]), str(types[i])
                # full (ts, seq) lexicographic guard — see
                # stream_burst_collapse (r11 fix; was ts-only)
                if last_us is not None and (u, q) < (last_us, last_seq):
                    n_late += 1
                    continue
                last_us, last_seq = u, q
                if ty == "signup" and signup_us is None:
                    signup_us = u
                elif (
                    ty == "purchase"
                    and signup_us is not None
                    and not converted
                ):
                    out.append((key[0], signup_us, u, u - signup_us))
                    converted = 1
        state.update((signup_us, converted, last_us, n_late, last_seq))
        if out:
            yield pd.DataFrame(
                {
                    "sid": [r[0] for r in out],
                    "signup_ts": pd.to_datetime(
                        np.asarray([r[1] for r in out], dtype="int64"),
                        unit="us",
                    ),
                    "purchase_ts": pd.to_datetime(
                        np.asarray([r[2] for r in out], dtype="int64"),
                        unit="us",
                    ),
                    "lag_us": np.asarray(
                        [r[3] for r in out], dtype="int64"
                    ),
                }
            )

    return (
        stream_df.select("sid", "seq", "event_type", "ts")
        .groupBy("sid")
        .applyInPandasWithState(
            fn,
            CONV_OUTPUT_SCHEMA,
            CONV_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


P2_OUTPUT_SCHEMA = (
    "sid string, seq long, ts timestamp, n long, q_est double"
)
P2_STATE_SCHEMA = StructType(
    [
        StructField("heights", ArrayType(DoubleType())),
        StructField("npos", ArrayType(LongType())),
        StructField("buf", ArrayType(DoubleType())),  # first <5 points
        StructField("last_us", LongType()),
        StructField("n_late", LongType()),
        # (ts, seq) guard tiebreaker — appended last; see TWA_STATE_SCHEMA
        StructField("last_seq", LongType()),
    ]
)


def _p2_step(heights: list, npos: list, x: float, p: float) -> None:
    """One Jain–Chlamtac P² marker update (in place): classify x into
    a cell, shift higher marker positions, then move each interior
    marker toward its desired position with the parabolic formula
    (linear fallback when the parabola would cross a neighbor)."""
    if x < heights[0]:
        heights[0] = x
        k = 0
    elif x >= heights[4]:
        heights[4] = x
        k = 3
    else:
        k = max(i for i in range(4) if heights[i] <= x)
    for i in range(k + 1, 5):
        npos[i] += 1
    n = npos[4]
    desired = (
        1.0,
        1.0 + (n - 1) * p / 2.0,
        1.0 + (n - 1) * p,
        1.0 + (n - 1) * (1.0 + p) / 2.0,
        float(n),
    )
    for i in (1, 2, 3):
        d = desired[i] - npos[i]
        if (d >= 1.0 and npos[i + 1] - npos[i] > 1) or (
            d <= -1.0 and npos[i - 1] - npos[i] < -1
        ):
            s = 1 if d >= 1.0 else -1
            hp = heights[i] + s / (npos[i + 1] - npos[i - 1]) * (
                (npos[i] - npos[i - 1] + s)
                * (heights[i + 1] - heights[i])
                / (npos[i + 1] - npos[i])
                + (npos[i + 1] - npos[i] - s)
                * (heights[i] - heights[i - 1])
                / (npos[i] - npos[i - 1])
            )
            if heights[i - 1] < hp < heights[i + 1]:
                heights[i] = hp
            else:
                heights[i] = heights[i] + s * (
                    heights[i + s] - heights[i]
                ) / (npos[i + s] - npos[i])
            npos[i] += s


def _exact_quantile(sorted_vals: list, p: float) -> float:
    """Continuous-interpolation quantile of a small sorted list (the
    init-phase estimate while fewer than 5 points have arrived)."""
    n = len(sorted_vals)
    if n == 1:
        return sorted_vals[0]
    pos = (n - 1) * p
    lo = int(pos)
    frac = pos - lo
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac


def stream_p2_quantile(stream_df: DataFrame, p: float = 0.5) -> DataFrame:
    """Streaming per-series quantile via the P² algorithm (Jain &
    Chlamtac 1985): a running p-quantile estimate from FIVE markers —
    O(1) state per series forever, where an exact streaming quantile
    needs O(n) history. The monitoring primitive behind live latency
    percentiles; the batch counterparts are ``value_quantiles``
    (exact) and ``value_quantiles_approx`` (GK sketch).

    Emits one row per accepted point with the estimate AFTER folding
    that point — during the first five points the estimate is the
    exact interpolated quantile of the prefix (the P² markers
    initialize from the first five sorted values). The per-point
    update is a fixed float-op sequence, so outputs are deterministic
    and CHUNKING-INVARIANT given the shared ordering contract (sort by
    (ts, seq) in-batch; older-than-last points drop into ``n_late``).
    """

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            heights, npos, buf, last_us, n_late, last_seq = state.get
            heights, npos, buf = list(heights), list(npos), list(buf)
        else:
            heights, npos, buf, last_us, n_late, last_seq = (
                [], [], [], None, 0, None,
            )
        out = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = _sort_batch(pdf)
            us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            seqs = pdf["seq"].to_numpy(dtype="int64")
            vals = pdf["value"].to_numpy(dtype="float64")
            for i in range(len(us)):
                u, q, x = int(us[i]), int(seqs[i]), float(vals[i])
                # full (ts, seq) lexicographic guard — see
                # stream_burst_collapse (r11 fix; was ts-only)
                if last_us is not None and (u, q) < (last_us, last_seq):
                    n_late += 1
                    continue
                last_us, last_seq = u, q
                if not npos:
                    buf.append(x)
                    if len(buf) == 5:
                        heights = sorted(buf)
                        npos = [1, 2, 3, 4, 5]
                        buf = []
                        est = heights[2] if p == 0.5 else _exact_quantile(
                            heights, p
                        )
                        n_seen = 5
                    else:
                        est = _exact_quantile(sorted(buf), p)
                        n_seen = len(buf)
                else:
                    _p2_step(heights, npos, x, p)
                    est = heights[2]
                    n_seen = npos[4]
                out.append((key[0], q, u, n_seen, est))
        state.update((heights, npos, buf, last_us, n_late, last_seq))
        if out:
            yield pd.DataFrame(
                {
                    "sid": [r[0] for r in out],
                    "seq": np.asarray([r[1] for r in out], dtype="int64"),
                    "ts": pd.to_datetime(
                        np.asarray([r[2] for r in out], dtype="int64"),
                        unit="us",
                    ),
                    "n": np.asarray([r[3] for r in out], dtype="int64"),
                    "q_est": np.asarray([r[4] for r in out], dtype="float64"),
                }
            )

    return (
        stream_df.select("sid", "seq", "ts", "value")
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("sid")
        .applyInPandasWithState(
            fn,
            P2_OUTPUT_SCHEMA,
            P2_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
