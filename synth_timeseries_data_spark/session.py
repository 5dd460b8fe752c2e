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
    # AQE on is the cluster posture (skew-join splitting, runtime partition
    # coalescing, dynamic broadcast) and measured best in aggregate locally
    # too: its per-exchange stage materialization costs ~100 ms per shuffle
    # boundary on sub-second queries (asof_lag 1.5 s vs 0.9 s without), but
    # turning it off regresses every query that leans on shuffle coalescing
    # (edge_tensor 0.9 s → 1.1 s, ngram_jaccard 0.6 s → 1.2 s) and the
    # derived-candidate joins now carry explicit BROADCAST hints so neither
    # mode mis-plans them. SPARK_GRAFT_AQE=false flips the trade for
    # latency-critical small-query workloads. Correctness is AQE-independent
    # (the one AQE hazard — coalescing the kernel-sweep grid to one
    # partition — is pinned by an explicit repartition; see
    # queries/generation.py).
    aqe = os.environ.get("SPARK_GRAFT_AQE", "true")
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
