from metevents_spark.functions.freq import freq_infer  # noqa: F401
