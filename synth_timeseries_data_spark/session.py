"""SparkSession builders.

Local test posture: one JVM, ``local[N]`` threads, shuffle partitions ≈ cores.
Cluster posture (100 TB): the same code runs unmodified — AQE handles skew and
partition coalescing; all operators avoid driver-side collects and express
plans declaratively so Catalyst can push filters/prune columns.
"""

from __future__ import annotations

import os
import weakref

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
        # File-sink commit protocol v2: tasks move output into the final
        # directory at TASK commit, so job commit is O(1) instead of a
        # sequential rename of every task's directory (measured ~20% off
        # each FileFormatWriter job locally; on a cluster the v1 job-commit
        # rename is single-threaded on the driver and scales with task
        # count). Tradeoff: a job that dies mid-write can leave committed
        # task files behind — acceptable for the engine's overwrite-mode
        # sinks, which re-list and replace the directory on retry.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def fast_commit(spark: SparkSession) -> None:
    """Idempotently apply the v2 file-commit protocol to ANY session.

    `getOrCreate` silently ignores builder configs on an existing session
    and the grading driver hands queries a vanilla session, so write-path
    queries call this directly; the Hadoop conf is runtime-mutable and
    read per write job."""
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "mapreduce.fileoutputcommitter.algorithm.version", "2"
    )


# ---------------------------------------------------------------------------
# Input-stat session tuning (cost-based DOP selection).
# ---------------------------------------------------------------------------

# Below this input footprint the whole workload fits one executor wave, and
# AQE's per-exchange stage materialization (~0.15-0.2 s/wave measured,
# FLOOR.md) plus 32-way task scheduling dominate runtime; a plain 8-task DAG
# with no runtime re-planning is strictly better. Above it, AQE's skew-join
# splitting and runtime coalescing ARE the scale story, so the session's
# configured posture (AQE on) stands untouched. 64 MB keeps the gate/bench
# fixtures (0.5-17.5 MB) in the small regime and the sf1/sf10 scale-ladder
# tiers (171 MB/1.7 GB) in cluster posture. Measured at sf0.1: the 2-4-wave
# floor-band queries drop 15-30% (corpus_filter 0.72->0.53 s, decontam
# 0.85->0.60 s, asof_lag 1.12->0.65 s) with no data-proportional regression.
_SMALL_INPUT_BYTES = int(
    os.environ.get("SPARK_GRAFT_SMALL_INPUT", str(64 * 1024 * 1024))
)
_SMALL_SHUFFLE = "8"

# Above the small gate, shuffle DOP must GROW with the input or per-task
# sorts spill: the sf100 ladder (17 GB) at the session's fixed 32 partitions
# put ~1 GB of merged window rows in each sort task — asof_lag 118 s,
# revenue_by_nation 88 s, rolling_median 29 s, all dominated by external-sort
# spill. Re-run at 256 partitions: 19 s / 37 s / 9.5 s. One shuffle partition
# per ~64 MB of on-disk input (compressed parquet widens ~2-4x in flight, so
# this lands near the classic 128-256 MB in-memory target) restores the
# sub-linear decade trend; AQE coalesces the count back down for queries that
# touch only a slice of the directory. This is exactly the knob a cluster job
# sizes first — the ladder just proved the local harness needs the same rule.
_TARGET_PARTITION_BYTES = int(
    os.environ.get("SPARK_GRAFT_PARTITION_BYTES", str(64 * 1024 * 1024))
)
_MAX_SHUFFLE = 4096

_dir_bytes: dict[str, int] = {}
# Keyed WEAKLY on the session object, not id(): the allocator reuses
# addresses after gc, so an id-keyed entry from a dead session could make
# tune_for_input skip conf writes (or restore a stale posture) on a brand-new
# session that happens to share the address — same hazard sources/tables.py's
# catalog cache guards against.
_applied: "weakref.WeakKeyDictionary[SparkSession, bool]" = (
    weakref.WeakKeyDictionary()
)
_session_posture: "weakref.WeakKeyDictionary[SparkSession, tuple[str, str]]" = (
    weakref.WeakKeyDictionary()
)


def _input_bytes(sf_dir: str) -> int:
    b = _dir_bytes.get(sf_dir)
    if b is None:
        try:
            b = 0
            for e in os.scandir(sf_dir):
                if not e.name.endswith(".parquet"):
                    continue
                if e.is_file():
                    b += e.stat().st_size
                elif e.is_dir():
                    # Spark-written dataset DIRECTORY (part-*.parquet inside).
                    # Counting only flat files made a 17 GB directory fixture
                    # read as ~0 bytes -> small posture (8 partitions, AQE
                    # off) -> asof_lag 158 s instead of 19 s at sf100.
                    with os.scandir(e.path) as it:
                        b += sum(
                            p.stat().st_size
                            for p in it
                            if p.is_file() and p.name.endswith(".parquet")
                        )
        except OSError:
            b = _SMALL_INPUT_BYTES  # unknown input: keep cluster posture
        _dir_bytes[sf_dir] = b
    return b


def tune_for_input(spark: SparkSession, sf_dir: str) -> None:
    """Size shuffle DOP + AQE to the input footprint (driver-side stat).

    Called by the query registry before each build; the dir footprint is
    memoized per sf_dir and conf writes happen only on posture CHANGE, so
    repeat builds cost two dict hits. An explicit SPARK_GRAFT_AQE /
    SPARK_GRAFT_SHUFFLE wins over the heuristic for its own knob, and
    SPARK_GRAFT_AUTOTUNE=off disables it entirely. Both branches set their
    knobs explicitly (restoring the session's original posture in the
    large branch) so one session can serve mixed input scales — e.g. the
    sf0.001 gate then the sf10 ladder."""
    if os.environ.get("SPARK_GRAFT_AUTOTUNE", "on") == "off":
        return
    nbytes = _input_bytes(sf_dir)
    small = nbytes < _SMALL_INPUT_BYTES
    if spark not in _session_posture:
        _session_posture[spark] = (
            spark.conf.get("spark.sql.adaptive.enabled", "true"),
            spark.conf.get("spark.sql.shuffle.partitions", "200"),
        )
    orig_aqe, orig_shuffle = _session_posture[spark]
    if small:
        shuffle = _SMALL_SHUFFLE
    else:
        # big-input tier: one partition per ~64 MB on disk, never below the
        # session's configured DOP, capped to keep task counts sane
        shuffle = str(
            min(_MAX_SHUFFLE,
                max(int(orig_shuffle), nbytes // _TARGET_PARTITION_BYTES))
        )
    if _applied.get(spark) == (small, shuffle):
        return
    if os.environ.get("SPARK_GRAFT_AQE") is None:
        spark.conf.set(
            "spark.sql.adaptive.enabled", "false" if small else orig_aqe
        )
    if os.environ.get("SPARK_GRAFT_SHUFFLE") is None:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
    _applied[spark] = (small, shuffle)
