"""Query inventory (SURVEY §2). Importing this package registers every
declared query into ai_to_cvent_etl_spark.registry."""

from ai_to_cvent_etl_spark.queries import (  # noqa: F401
    aggregates,
    analytics_plus,
    analytics_r2,
    analytics_r3,
    dedup_scale,
    etl,
    filters,
    functions,
    graph,
    joins,
    llm_text,
    multimodal,
    scans,
    setops,
    sketches,
    streaming_batch,
    text,
    timeseries,
    tpch,
    udfs,
    vectors,
    vectors_pq,
    windows,
)
