"""ai_to_cvent_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of AASHE/ai-to-cvent-etl (see SURVEY.md; the reference tree is
unavailable in this environment, so the binding spec is the driver contract in
``__spark_entry__.py`` + SURVEY.md §2's operator inventory).

Layout:
    session.py    SparkSession factory tuned for local[32] test runs
    io.py         explicit table schemas + parquet loaders + view registration
    registry.py   QuerySpec registry: every declared query + its DuckDB oracle
    queries/      SURVEY §2 operator inventory, one module per section
    operators/    reusable engine operators (as-of join, skew salting, multimodal)
    connectors/   CSV/JSON/Parquet + JDBC wrappers + executor-side REST sink
    streaming/    Structured Streaming twins of the batch queries
"""

__version__ = "0.1.0"
