"""Streaming per-series numpy kernels over sorted partitions.

``groupBy(sid).applyInPandas`` costs one pandas DataFrame construction
per *group*; with millions of small series that per-group overhead
dominates (measured ~10ms/group). This helper instead hash-partitions
by sid, sorts within partitions, and runs ``mapInPandas`` with a numpy
group-splitter per Arrow batch: per-batch vectorized dtype conversion,
``np.flatnonzero`` boundary detection, and a carry for series that
straddle batch/partition boundaries. Memory stays O(batch + largest
series); parallelism is explicit (one shuffle on sid), immune to AQE
coalescing the shuffle below core count just because the bytes are
small.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: kernel(sid, ts: datetime64[us] array, values: float64 array) -> list of
#: output-row tuples matching the caller's schema.
SeriesKernel = Callable[[str, np.ndarray, np.ndarray], list[tuple]]


def map_series_kernel(
    df: DataFrame,
    kernel: SeriesKernel,
    schema: str,
    out_columns: list[str],
    out_dtypes: dict[str, str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Apply ``kernel`` once per series over the canonical frame."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    prepared = df.repartition(num_partitions, "sid").sortWithinPartitions(
        "sid", "ts", "seq"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: tuple | None = None  # (sid, ts_np, val_np)
        rows: list[tuple] = []

        def flush() -> Iterator[pd.DataFrame]:
            nonlocal rows
            if rows:
                out = pd.DataFrame(rows, columns=out_columns).astype(out_dtypes)
                rows = []
                yield out

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            sids = pdf["sid"].to_numpy(dtype=object)
            ts = pdf["ts"].to_numpy(dtype="datetime64[us]")
            vals = pdf["value"].to_numpy(dtype=np.float64)
            change = np.flatnonzero(sids[1:] != sids[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [n]))
            last = len(starts) - 1
            for i in range(len(starts)):
                s, e = int(starts[i]), int(ends[i])
                sid = sids[s]
                seg_ts, seg_v = ts[s:e], vals[s:e]
                if carry is not None:
                    if carry[0] == sid:
                        seg_ts = np.concatenate((carry[1], seg_ts))
                        seg_v = np.concatenate((carry[2], seg_v))
                    else:
                        rows.extend(kernel(carry[0], carry[1], carry[2]))
                    carry = None
                if i == last:
                    carry = (sid, seg_ts, seg_v)
                else:
                    rows.extend(kernel(sid, seg_ts, seg_v))
            yield from flush()
        if carry is not None:
            rows.extend(kernel(carry[0], carry[1], carry[2]))
        yield from flush()

    return prepared.mapInPandas(run, schema)


EVENT_OUT_COLUMNS = ["sid", "start", "stop", "duration_us", "n_points", "total"]
EVENT_OUT_DTYPES = {
    "start": "datetime64[us]",
    "stop": "datetime64[us]",
    "duration_us": "int64",
    "n_points": "int64",
    "total": "float64",
}
