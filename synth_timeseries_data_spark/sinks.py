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
