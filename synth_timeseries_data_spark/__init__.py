"""synth_timeseries_data_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the reference
repo kendigsham/synth_timeseries_data (a fork of hferdous/TimeGraph — a
synthetic multivariate time-series generator for causal-discovery
benchmarking) as an idiomatic Spark DataFrame/SQL engine, plus the
LLM-data-pipeline operator surface (dedup, similarity search, multimodal
columns, text analysis) required for 100 TB-scale training-data work.

Layout
------
- ``session``     SparkSession builder (nanosAsLong parquet posture, AQE, UTC)
- ``sources``     fixture-table loaders (parquet, narrow-select discipline)
- ``sinks``       CSV / edge-list parquet / structure sidecars / partitioned layout
- ``functions``   cross-engine deterministic randoms (LCG) + decimal numerics
- ``dsl``         equation registries (linear/poly/trig/irregular/confounded) as data
- ``generation``  sequential SCM kernels (regular, irregular, confounded) —
                  bit-exact vs the reference's seed-42 CSVs, scale-out across configs
- ``streaming``   Structured Streaming jobs (tumbling/session windows, watermark dedup)
- ``queries``     the driver-facing registry: every operator as a named query
                  pairing the Spark builder with its DuckDB oracle SQL
                  (relational, graph metrics, DSL parse, codecs, masks,
                  projections, time-series/as-of, LLM pipeline, multimodal,
                  streaming analogs, IO round-trips)
"""

__version__ = "0.2.0"
