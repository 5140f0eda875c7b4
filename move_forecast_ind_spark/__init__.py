"""move_forecast_ind_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference stack (satya-dataengineer/move-forecast-IND:
per-branch time-series forecasting, a percentage-precompute ETL, and a
request/response query layer), plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) and Structured
Streaming — every operator designed for 100 TB scale.

Layout:
- ``session``    — SparkSession construction / runtime tuning
- ``sources``    — table loaders over parquet (the lake), model artifacts
- ``functions``  — column-expression libraries (rounding, dates, text, vectors)
- ``operators``  — composite dataflow operators (as-of join, dedup, similarity)
- ``plans``      — the reference's three pipelines re-expressed as single Spark plans
- ``streaming``  — Structured Streaming pipelines over the events table
- ``queries``    — the driver-facing registry: named queries + DuckDB oracle SQL
"""

__version__ = "0.1.0"
