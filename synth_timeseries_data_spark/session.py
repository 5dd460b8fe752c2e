"""SparkSession builders.

Local test posture: one JVM, ``local[N]`` threads, shuffle partitions ≈ cores.
Cluster posture (100 TB): the same code runs unmodified — AQE handles skew and
partition coalescing; all operators avoid driver-side collects and express
plans declaratively so Catalyst can push filters/prune columns.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "synth_timeseries_data_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Shuffle parallelism is decoupled from executor threads: at local test
    # scale the data is small enough that fewer, larger shuffle partitions
    # beat per-task scheduling overhead; AQE still coalesces further. On a
    # real cluster SPARK_GRAFT_SHUFFLE would be sized to the data (~128 MB
    # per partition), not to the core count.
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", cpus)
    # AQE is a scale-dependent trade: its per-exchange stage materialization
    # costs ~100-300 ms of sequential job latency per shuffle boundary, which
    # dominates sub-second queries at local fixture scale (asof_lag measured
    # 1.48 s with AQE vs 0.93 s without), while its benefits — skew-join
    # splitting, runtime partition coalescing, dynamic broadcast — only pay
    # off when shuffle sizes are large or unpredictable. Default off for the
    # local bench posture; a cluster deployment sets SPARK_GRAFT_AQE=true.
    # Correctness is AQE-independent (the one AQE hazard — coalescing the
    # kernel-sweep grid to one partition — is pinned by an explicit
    # repartition; see queries/generation.py).
    aqe = os.environ.get("SPARK_GRAFT_AQE", "false")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Fixture events.parquet stores ts as INT64 TIMESTAMP(NANOS), which
        # Spark 4.x rejects by default; read it as an epoch-nanosecond BIGINT
        # (queries convert with `ts div 1000` to the canonical microsecond
        # scale — DuckDB oracles keep epoch_us(ts) since DuckDB reads NANOS
        # natively as TIMESTAMP).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
