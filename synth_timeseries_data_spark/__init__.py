"""synth_timeseries_data_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the reference
repo kendigsham/synth_timeseries_data (a fork of hferdous/TimeGraph — a
synthetic multivariate time-series generator for causal-discovery
benchmarking) as an idiomatic Spark DataFrame/SQL engine, plus the
LLM-data-pipeline operator surface (dedup, similarity search, multimodal
columns, text analysis) required for 100 TB-scale training-data work.

Layout
------
- ``session``     SparkSession builders tuned for local testing / cluster posture
- ``sources``     table loaders (parquet/csv/json) for the test fixtures
- ``functions``   reusable column expressions (deterministic randoms, vectors, time)
- ``dsl``         the reference's equation DSL: registry, parser, topo sort
- ``generation``  the synthetic-series generation kernel (applyInPandas)
- ``graph``       causal-edge-list operators + scoring metrics
- ``operators``   relational/window/dedup/similarity/text operator library
- ``streaming``   Structured Streaming pipelines (session windows, watermark dedup)
- ``queries``     the driver-facing query registry (Spark build + DuckDB oracle SQL)
"""

__version__ = "0.1.0"
