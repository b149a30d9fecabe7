"""Z-order clustered sink: multi-dimensional data-skipping layout.

A linear sort narrows parquet min/max ranges for ONE column; the
Morton-key layout must narrow them for EVERY clustering column at
once, so predicates on either dimension prune files."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from metevents_spark.io import load_table, write_zordered

SF = "/root/testdata/sf0.001"


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                c = g.column(i)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((float(lo), float(hi)))
    return spans


def _mean_width(spans, total_lo, total_hi):
    w = (total_hi - total_lo) or 1.0
    return sum((hi - lo) / w for lo, hi in spans) / len(spans)


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        F.col("user_id").cast("double").alias("user_id"),
        F.col("value").cast("double").alias("value"),
        "event_id",
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(ev, zpath, ["user_id", "value"], n_files=8)
    # baseline: single-column sort narrows user_id but not value
    ev.repartitionByRange(8, "user_id").sortWithinPartitions(
        "user_id"
    ).write.mode("overwrite").parquet(lpath)

    bounds = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    u_lo, u_hi, v_lo, v_hi = [float(x) for x in bounds]

    z_user = _mean_width(_file_ranges(zpath, "user_id"), u_lo, u_hi)
    z_val = _mean_width(_file_ranges(zpath, "value"), v_lo, v_hi)
    l_val = _mean_width(_file_ranges(lpath, "value"), v_lo, v_hi)

    # both dimensions narrow under z-order (each file covers a strict
    # sub-range: measured ~0.41/0.35 on this fixture), while the
    # linear layout prunes only its own sort column (~0.77 on value)
    assert z_user < 0.6, z_user
    assert z_val < 0.6, z_val
    assert z_val < l_val * 0.6, (z_val, l_val)

    # layout change only: contents round-trip exactly
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert set(back.columns) == set(ev.columns)
    assert (
        back.agg(F.sum("event_id")).collect()[0][0]
        == ev.agg(F.sum("event_id")).collect()[0][0]
    )

def test_zorder_rejects_string_columns(spark):
    import pytest

    from metevents_spark.io import zorder_key

    df = spark.createDataFrame([(1.0, "a")], ["x", "s"])
    with pytest.raises(TypeError, match="numeric"):
        zorder_key(df, ["x", "s"])


def test_zorder_timestamp_ntz_column(spark):
    """TIMESTAMP_NTZ has no direct cast to DOUBLE (AnalysisException
    DATATYPE_MISMATCH), so the NTZ branch must route through epoch
    micros — and the resulting zkey must actually cluster on time, not
    go NULL or constant."""
    from metevents_spark.io import zorder_key

    df = spark.sql(
        "SELECT CAST(timestamp_ntz'2024-01-01 00:00:00' + make_interval("
        "0, 0, 0, 0, id, 0, 0) AS timestamp_ntz) AS ts, "
        "CAST(id % 17 AS DOUBLE) AS v FROM range(300)"
    )
    from pyspark.sql import types as T

    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    keyed = zorder_key(df, ["ts", "v"])
    assert keyed.filter(F.col("zkey").isNull()).count() == 0
    assert keyed.select("zkey").distinct().count() > 10
    # monotone image: the earliest and latest timestamps land in the
    # low / high time cells, so their time-bit prefixes must differ
    lo_key, hi_key = (
        keyed.orderBy("ts").select("zkey").first()[0],
        keyed.orderBy(F.col("ts").desc()).select("zkey").first()[0],
    )
    assert lo_key != hi_key


def test_zorder_null_cells_keep_range_spread(spark, tmp_path):
    """NULLs in a clustering column must land in grid cell 0, not
    produce a NULL zkey — a NULL zkey would funnel every such row into
    one range partition (single-task write)."""
    from metevents_spark.io import zorder_key

    rows = [(float(i) if i % 3 else None, float(i * 7 % 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "x double, y double")
    keyed = zorder_key(df, ["x", "y"])
    assert keyed.filter(F.col("zkey").isNull()).count() == 0
    # NULL-x rows still spread over y's bit positions: more than one
    # distinct zkey among them
    nkeys = (
        keyed.filter(F.col("x").isNull()).select("zkey").distinct().count()
    )
    assert nkeys > 10, nkeys
