from metevents_spark.relational.tpch import (  # noqa: F401
    brand_revenue,
    daily_rollup,
    nation_segment_rollup,
    order_priority_check,
    pricing_summary,
    revenue_topn,
    region_revenue,
    top_customers_per_segment,
)
