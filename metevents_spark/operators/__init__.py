from metevents_spark.operators.runs import flag_runs, runs_to_events  # noqa: F401
from metevents_spark.operators.detectors import (  # noqa: F401
    data_gap,
    extreme_change,
    extreme_value,
    flat_line,
)
from metevents_spark.operators.storms import storm_find  # noqa: F401
from metevents_spark.operators.spikes import spike_valley  # noqa: F401
from metevents_spark.operators.changepoint import cusum_alarm  # noqa: F401
from metevents_spark.operators.intervals import (  # noqa: F401
    interval_overlap_join,
)
