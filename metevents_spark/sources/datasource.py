"""Spark 4 Python DataSource for station series.

Reference parity target: ``StormEvents.from_station``
(/root/reference/metevents/events.py:123-165) pulls ONE station on the
driver. This source instead makes station fetch a first-class Spark
scan: ``spark.read.format("station")`` with one *input partition per
station*, so a 10k-station pull runs as 10k parallel partition reads on
executors — the fetch itself is distributed, not a driver loop.

Rows stream back as Arrow record batches (columnar, zero row-at-a-time
Python cost). The backing store here is the pre-landed events parquet
(the test stand-in for a station data lake); a live HTTP backend slots
into ``_fetch_batches`` unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class StationInputPartition(InputPartition):
    def __init__(self, station_id: str):
        self.station_id = station_id


class StationDataSource(DataSource):
    """``spark.read.format("station").option("path", dir)
    .option("stations", "0,1,2").load()``

    Options:
      path      directory containing events.parquet (or a parquet file)
      stations  comma-separated station ids (default: discovered from
                the data at planning time)
    """

    @classmethod
    def name(cls) -> str:
        return "station"

    def schema(self) -> str:
        return "sid string, seq bigint, ts timestamp, value double"

    def reader(self, schema) -> "StationReader":
        return StationReader(self.options)

    def simpleStreamReader(self, schema):
        """Incremental micro-batch tail of the station feed
        (``spark.readStream.format("station")``): each batch reads only
        rows with ``event_id`` past the committed high-watermark — the
        append-only-log contract of a station ingest pipeline. Offsets
        replay exactly (``readBetweenOffsets``), so recovery from a
        checkpoint re-produces identical batches. Driver-side reads
        (SimpleDataSourceStreamReader) fit a control-plane-sized feed;
        a partition-planned DataSourceStreamReader slots in when batch
        volume demands executor-side fetch."""
        return _station_stream_reader(_station_path(self.options))


class StationReader(DataSourceReader):
    def __init__(self, options):
        self.path = _station_path(options)
        self.stations = [
            s for s in (options.get("stations") or "").split(",") if s
        ]

    def partitions(self):
        stations = self.stations
        if not stations:
            import duckdb

            stations = [
                str(r[0])
                for r in duckdb.sql(
                    f"SELECT DISTINCT user_id FROM '{self.path}' ORDER BY 1"
                ).fetchall()
            ]
        return [StationInputPartition(s) for s in stations]

    def read(self, partition: StationInputPartition):
        import duckdb

        # one station per partition: executor-side fetch, Arrow batches
        reader = duckdb.sql(
            f"""
            SELECT CAST(user_id AS VARCHAR) AS sid,
                   event_id AS seq,
                   CAST(ts AS TIMESTAMP) AS ts,
                   CAST(value AS DOUBLE) AS value
            FROM '{self.path}'
            WHERE CAST(user_id AS VARCHAR) = '{partition.station_id}'
            ORDER BY ts, event_id
            """
        ).fetch_arrow_reader(batch_size=65536)
        for batch in reader:
            yield batch


def register_station_source(spark) -> None:
    spark.dataSource.register(StationDataSource)


def _station_path(options) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("station source requires .option('path', ...)")
    if not path.endswith(".parquet"):
        path = f"{path}/events.parquet"
    return path


def _station_stream_reader(path: str):
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class StationStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"max_seq": -1}

        def _query(self, lo: int, hi: int | None):
            import duckdb

            bound = f"AND event_id <= {hi}" if hi is not None else ""
            return duckdb.sql(
                f"""
                SELECT CAST(user_id AS VARCHAR) AS sid,
                       event_id AS seq,
                       CAST(ts AS TIMESTAMP) AS ts,
                       CAST(value AS DOUBLE) AS value
                FROM '{path}'
                WHERE event_id > {lo} {bound}
                ORDER BY event_id
                """
            ).fetchall()

        def read(self, start):
            rows = self._query(int(start["max_seq"]), None)
            if not rows:
                return iter([]), start
            new_max = max(r[1] for r in rows)
            return iter(rows), {"max_seq": int(new_max)}

        def readBetweenOffsets(self, start, end):
            return iter(
                self._query(int(start["max_seq"]), int(end["max_seq"]))
            )

    return StationStreamReader()
