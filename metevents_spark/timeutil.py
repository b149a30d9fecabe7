"""Timezone-robust epoch arithmetic.

The driver-generated parquet stores naive microsecond timestamps
(``isAdjustedToUTC=false``), which Spark 4 reads as ``TIMESTAMP_NTZ``
(``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults to true).
``F.unix_micros`` rejects NTZ input outright, so every operator that
needs epoch math goes through :func:`epoch_us` instead.

``epoch_us`` computes micros since 1970-01-01 via ``timestamp_diff`` on
the NTZ wall-clock fields — fully independent of the session time zone
for NTZ input (the common case), and identical to ``unix_micros`` for
tz-aware input under the UTC session zone our factory pins
(metevents_spark/session.py:32).  The DuckDB oracle computes
``epoch(ts)`` over the same naive values, so naive-as-UTC is exactly
the comparison semantics the correctness gate uses.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["epoch_us", "to_ntz"]

def _epoch_ntz() -> Column:
    # Built lazily: F.lit needs an active SparkContext at call time.
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_ntz(c: Column | str) -> Column:
    """Normalize any timestamp flavor to ``TIMESTAMP_NTZ``.

    NTZ input passes through untouched; tz-aware input is rendered in
    the session time zone (UTC in our sessions), matching the naive
    values the oracle sees in the parquet files.
    """
    return _as_col(c).cast("timestamp_ntz")


def epoch_us(c: Column | str) -> Column:
    """Microseconds since epoch as BIGINT, for TIMESTAMP or TIMESTAMP_NTZ.

    Drop-in replacement for ``F.unix_micros`` that tolerates the NTZ
    columns Spark infers from the driver's parquet.  Pure JVM
    expression — stays inside whole-stage codegen.
    """
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), to_ntz(c))
