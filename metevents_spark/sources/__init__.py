from metevents_spark.sources.station import (  # noqa: F401
    ParquetBackend,
    fetch_station_series,
)
