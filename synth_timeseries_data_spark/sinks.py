"""Sinks (G16 CSV, G17 edge-list parquet, G18 structure sidecar) and the
partitioned dataset layout.

The reference persists one CSV + npy tensors + a structure txt per config
into a `family/noise/vars/lag` directory tree (Codes/a1.py:237-306). The
engine's equivalents: CSV with header and empty-string nulls (pandas
to_csv compatible), edge lists as parquet (the relational tensor form), a
JSON-lines structure sidecar via df.write.json, and
`partitionBy(family, noise, n_vars, max_lag)` for the tree — which at
100 TB doubles as partition pruning for any per-config read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dsl.registry import equations
from .queries.dsl import _parsed_edges


def write_series_csv(df: DataFrame, path: str) -> None:
    """G16: wide series table → CSV, header on, NULL → empty string (the
    pandas NaN→'' convention the reference's CSVs use, a1.py:242-243)."""
    df.write.mode("overwrite").option("header", True).option("nullValue", "").csv(path)


def read_series_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.option("header", True)
        .option("nullValue", "")
        .schema(schema)
        .csv(path)
    )


def write_edge_list(spark: SparkSession, path: str) -> None:
    """G17: ground-truth edge lists for every registry config as parquet —
    the engine's answer to the reference's .npy tensors (a1.py:269-270)."""
    _parsed_edges(spark).write.mode("overwrite").parquet(path)


def write_structure_json(spark: SparkSession, path: str) -> None:
    """G18: structure sidecar as JSON lines (df.write.json) — one record per
    edge with the equation text attached, replacing the reference's
    free-text `(source, lag, target) => coef` files (a1.py:296-306)."""
    edges = _parsed_edges(spark)
    edges.select(
        "family",
        "n_vars",
        "max_lag",
        "source",
        "target",
        "lag",
        "func",
        "coef",
        F.concat(
            F.lit("("), "source", F.lit(", "), F.col("lag").cast("string"),
            F.lit(", "), "target", F.lit(") => "), F.col("coef").cast("string"),
        ).alias("link_str"),
    ).write.mode("overwrite").json(path)


def write_structure_txt(family: str, n_vars: int, max_lag: int, path: str) -> None:
    """Driver-side text twin of the reference's structure file format
    (a1.py:298-306) for single-config interop."""
    eqs = equations(family, n_vars, max_lag)
    with open(path, "w") as f:
        f.write(f"True Causal Structure ({family}):\n")
        f.write("Format: (source, lag, target) => coefficient\n")
        f.write("\nEquations:\n")
        for eq in eqs:
            f.write(f"{eq}\n")


def write_partitioned_dataset(df: DataFrame, path: str, *cols: str) -> None:
    """Partitioned layout (default family/noise/n_vars/max_lag — the
    Datasets/ tree, SURVEY.md §0) with partition pruning for free."""
    keys = list(cols) or ["family", "noise", "n_vars", "max_lag"]
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def _decomposition_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point series + fitted trend — the data behind the reference's
    decomposition panels (c1.py:391-411: plot series, overlay the degree-1
    np.polyfit line). The fit comes from trend_fit's exact-bigint-sum OLS;
    joining it back is a series-keyed equi join (per-series fit rows are
    tiny relative to points at any scale, and the join key matches the
    series partitioning every window op already uses)."""
    from .queries.relational import _T0_US, _TS_US, _trend_fit_sql

    from .sources import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    td = f"(CAST({_TS_US} - {_T0_US} AS DOUBLE) / 86400000000.0)"
    return spark.sql(
        f"""
        WITH fit AS ({_trend_fit_sql(_TS_US)}),
        pts AS (SELECT user_id, event_id, {td} AS x_day, value FROM events)
        SELECT p.user_id, p.event_id, p.x_day, p.value,
               f.intercept + f.slope * p.x_day AS trend
        FROM pts p JOIN fit f ON f.user_id = p.user_id
        """
    )


def write_plot_bundle(spark: SparkSession, sf_dir: str, out: str) -> DataFrame:
    """G19 end-to-end: ONE invocation materializes the three plot-data
    frames the reference renders per run — decomposition series+trend
    (c1.py:391-411), sampling-interval histogram (c2.py:332-341), and
    missing-pattern heatmap cells (d1.py:327-337) — as one hive-partitioned
    dataset: ``out/frame=<name>/``. A plotting client reads exactly the
    frame it needs via partition pruning. Returns a (frame, n_rows)
    summary built from the written files' parquet footers (driver-side
    metadata read — verifies the write landed without a re-scan)."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    from .queries.events_ext import missing_pattern
    from .queries.relational import sampling_hist
    from .session import fast_commit

    fast_commit(spark)
    frames = {
        "decomposition": _decomposition_frame(spark, sf_dir),
        "sampling_hist": sampling_hist(spark, sf_dir),
        "missing_pattern": missing_pattern(spark, sf_dir),
    }

    def _write(item):
        # Spark job submission is thread-safe; the three writes are
        # independent jobs, so submitting them concurrently lets the
        # scheduler interleave their stages instead of serializing three
        # write-job latencies (bundle wall time ≈ the slowest frame).
        name, df = item
        path = os.path.join(out, f"frame={name}")
        df.write.mode("overwrite").parquet(path)
        n = sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        return name, n

    with ThreadPoolExecutor(max_workers=len(frames)) as pool:
        counts = list(pool.map(_write, frames.items()))
    return spark.createDataFrame(counts, "frame string, n_rows long")


def write_curated_corpus(spark: SparkSession, sf_dir: str, out: str) -> DataFrame:
    """LLM-EXT end-to-end: ONE invocation runs the curation pipeline the
    individual queries are the evidence trail for — Gopher quality gates
    (`gopher_rules`), MinHash near-dup dedup (keep-min-doc_id rule from
    `dedup_clusters`), and DSIR target-domain importance weights
    (`dsir_weights`) — and ships two datasets:

    - ``out/decisions/``: one row per input document with every gate's
      verdict (quality flag, dedup-survivor flag, the Gopher rule verdict
      as a recorded signal, DSIR log-weight + sign) and the final ``keep``
      — the audit table a curation run must leave behind;
    - ``out/corpus/``: the kept documents (text included), partitioned by
      source — the corpus a training run actually reads.

    keep = quality AND dedup-survivor, where the hard quality gate is
    corpus_filter's per-doc composite (lang allowlist + the quality_score
    threshold — calibrated for this corpus). The full Gopher verdict is
    RECORDED, not gated on: its English-stopword rule rejects the entire
    synthetic fixture (stop_hits < 2 corpus-wide), and a curation run's
    audit table should show that, not silently ship an empty corpus. The
    DSIR weight likewise rides along as the sampling signal for the
    downstream resampler rather than a hard gate (selection pressure is a
    SAMPLING decision, Xie et al. 2023 §3).

    Scale shape: the three per-doc relations all end doc-clustered (the
    gopher projection and dsir's final aggregate inherit the spread view's
    hash(doc_id) partitioning), so the decision joins need no extra
    full-corpus exchange beyond what the component queries already do; the
    near-dup drop set is cluster-member-proportional and broadcasts (same
    size gate as neardup_survivors). Returns a (stage, n) summary frame
    built from the written files' parquet footers — write verification
    without a re-scan."""
    import pyarrow.parquet as pq

    from .functions.scale import broadcast_if_small
    from .queries.corpus_ext import gopher_rules
    from .queries.llm_pipeline import dedup_clusters, dsir_weights
    from .session import fast_commit
    from .sources import load, table_rows

    fast_commit(spark)
    gopher = gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("gopher_keep")
    )
    reps = dedup_clusters(spark, sf_dir)
    drops = reps.where(F.col("doc_id") != F.col("cluster_rep")).select(
        "doc_id", F.lit(True).alias("is_dup")
    )
    dsir = dsir_weights(spark, sf_dir).select(
        "doc_id", "n_tokens", "logw_nats", "more_target_like"
    )
    docs = load(spark, sf_dir, "documents")
    # The hard quality gate: corpus_filter's per-doc composite (same
    # constants — _KEEP_LANGS allowlist, quality_score formula thresholded
    # at _Q_MIN on the ROUND(.,6) grain), as a projection over the scan.
    from .queries.llm_pipeline import _KEEP_LANGS, _Q_MIN, _STOPWORDS

    quality = docs.selectExpr(
        "doc_id",
        f"""
        lang IN {_KEEP_LANGS} AND
        ROUND(LEAST(1.0, size(split(text, ' ')) / 100.0) * 0.5
              + LEAST(1.0, (CAST(size(filter(split(text, ' '),
                                             w -> w IN {_STOPWORDS}))
                                 AS DOUBLE)
                            / size(split(text, ' '))) * 10.0) * 0.2
              + (CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)
                 / size(split(text, ' '))) * 0.3, 6) >= {_Q_MIN}
        AS keep_quality
        """,
    )
    # Both derived doc-id sets are size-gated before hinting: the drop set
    # is near-dup-proportional, but the KEPT set is corpus-proportional —
    # force-broadcasting it at a billion docs is the exact
    # driver-maxResultSize failure the sf100 ladder caught on
    # revenue_by_nation's order bridge. ~32 B/row of id+flag.
    doc_bytes = table_rows(sf_dir, "documents") * 32
    decisions = (
        docs.select("doc_id", "source", "lang")
        .join(quality, "doc_id")
        .join(gopher, "doc_id")
        .join(dsir, "doc_id")
        .join(broadcast_if_small(drops, doc_bytes), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            "keep_quality",
            F.col("is_dup").isNull().alias("keep_dedup"),
            "gopher_keep",
            "logw_nats",
            "more_target_like",
            (F.col("keep_quality") & F.col("is_dup").isNull()).alias("keep"),
        )
    )
    dec_path = os.path.join(out, "decisions")
    decisions.write.mode("overwrite").parquet(dec_path)
    corpus_path = os.path.join(out, "corpus")
    kept = spark.read.parquet(dec_path).where("keep").select("doc_id")
    docs.join(broadcast_if_small(kept, doc_bytes), "doc_id").write.mode(
        "overwrite"
    ).partitionBy("source").parquet(corpus_path)

    def _footer_rows(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                pq.read_metadata(os.path.join(root, f)).num_rows
                for f in files
                if f.endswith(".parquet")
            )
        return total

    dec = spark.read.parquet(dec_path)
    agg = dec.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(~F.col("keep_quality"), 1).otherwise(0)).alias("n_fail_quality"),
        F.sum(F.when(~F.col("keep_dedup"), 1).otherwise(0)).alias("n_dup_dropped"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0)).alias(
            "n_tokens_kept"
        ),
    ).collect()[0]
    rows = [
        ("docs_in", int(agg["n_docs"])),
        ("fail_quality", int(agg["n_fail_quality"])),
        ("dup_dropped", int(agg["n_dup_dropped"])),
        ("kept", int(agg["n_kept"])),
        ("tokens_kept", int(agg["n_tokens_kept"])),
        ("decisions_rows_written", _footer_rows(dec_path)),
        ("corpus_rows_written", _footer_rows(corpus_path)),
    ]
    return spark.createDataFrame(rows, "stage string, n long")
