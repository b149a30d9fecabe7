"""Station connector — parity with ``StormEvents.from_station``.

Reference (metevents/events.py:123-165): dispatch ``source`` over
{NRCS -> Snotel, CDEC, Mesowest} metloom PointData classes, fetch daily
PRECIPITATIONACCUM, ValueError on unknown source (:145-149) or empty
result (:156-161), then ``.diff()`` to convert accumulated to
incremental (:165).

Here the fetch is a pluggable *backend* (driver-side, the network is a
driver concern); metloom itself is optional (import-gated — not in this
container). The default backend reads pre-landed parquet, which is also
the 100 TB path: land station data to object storage, scan it
distributed. The accumulated->incremental diff is a lag-window on the
cluster, not pandas on the driver.
"""

from __future__ import annotations

from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metevents_spark.operators.runs import series_window

#: source name -> metloom class name (dispatch table parity,
#: metevents/events.py:139-143)
KNOWN_SOURCES = ("NRCS", "CDEC", "Mesowest")


class StationBackend(Protocol):
    def fetch(
        self, station_id: str, start, stop, station_name: str, source: str
    ) -> pd.DataFrame | None:
        """-> DataFrame with columns (datetime, value): daily
        accumulated precipitation, or None when no data."""


class ParquetBackend:
    """Pre-landed parquet keyed by station id (default / test backend).

    Maps a station id onto the driver testdata ``events`` table
    (user_id as station key) so the full connector path is exercisable
    without network access.
    """

    def __init__(self, path_or_dir: str):
        self.path = path_or_dir

    def fetch(self, station_id, start, stop, station_name, source):
        import duckdb

        path = self.path
        if not path.endswith(".parquet"):
            path = f"{path}/events.parquet"
        pdf = duckdb.sql(
            f"""
            SELECT ts AS datetime, SUM(value) OVER (ORDER BY ts, event_id) AS value
            FROM '{path}'
            WHERE CAST(user_id AS VARCHAR) = '{station_id}'
              AND ts >= TIMESTAMP '{pd.Timestamp(start)}'
              AND ts <= TIMESTAMP '{pd.Timestamp(stop)}'
            ORDER BY ts
            """
        ).df()
        return pdf if len(pdf) else None


class MetloomBackend:
    """Live metloom fetch — optional dependency, import-gated."""

    def fetch(self, station_id, start, stop, station_name, source):
        try:
            from metloom.pointdata import (  # type: ignore
                CDECPointData,
                MesowestPointData,
                SnotelPointData,
            )
        except ImportError as exc:  # pragma: no cover
            raise ImportError(
                "metloom is not installed; use ParquetBackend or install metloom"
            ) from exc
        classes = {
            "nrcs": SnotelPointData,
            "cdec": CDECPointData,
            "mesowest": MesowestPointData,
        }
        cls = classes[source.lower()]
        pnt = cls(station_id, station_name)
        variable = pnt.ALLOWED_VARIABLES.PRECIPITATIONACCUM
        df = pnt.get_daily_data(start, stop, [variable])
        if df is None:
            return None
        df = df.reset_index().set_index("datetime")
        out = df[[variable.name]].reset_index()
        out.columns = ["datetime", "value"]
        return out


def fetch_station_series(
    station_id: str,
    start,
    stop,
    station_name: str = "unknown",
    source: str = "NRCS",
    spark: SparkSession | None = None,
    backend: StationBackend | None = None,
) -> DataFrame:
    """-> canonical (sid, seq, ts, value) frame of *incremental* values.

    Validation errors mirror the reference exactly:
      - unknown source -> ValueError naming valid sources (:145-149)
      - empty fetch    -> ValueError describing the query (:156-161)
    """
    if source.lower() not in {s.lower() for s in KNOWN_SOURCES}:
        raise ValueError(
            f"Datasource {source} is invalid. Use {', '.join(KNOWN_SOURCES)}"
        )
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("no active SparkSession; pass spark=...")
    if backend is None:
        backend = MetloomBackend()

    pdf = backend.fetch(station_id, start, stop, station_name, source)
    if pdf is None:
        raise ValueError(
            f"The combination of pulling precip from {station_id} "
            f"during {start}-{stop} produced no data. Check station "
            f"is real and has precip data between specified dates."
        )

    pdf = pdf.rename(columns={"datetime": "ts"})
    pdf["sid"] = str(station_id)
    pdf["seq"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf[["sid", "seq", "ts", "value"]])
    # accumulated -> incremental (reference .diff(), events.py:165) as a
    # lag window: distributed, shares the sid/ts sort with downstream
    # detectors.
    w = series_window()
    return sdf.withColumn("value", F.col("value") - F.lag("value").over(w))
