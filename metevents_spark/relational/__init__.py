from metevents_spark.relational.tpch import (  # noqa: F401
    daily_rollup,
    pricing_summary,
    revenue_topn,
    region_revenue,
    top_customers_per_segment,
)
