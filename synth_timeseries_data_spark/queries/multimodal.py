"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched `mapInPandas` (EXT surface).

The pattern for image/audio/video at 100 TB: store the payload as a `binary`
column next to typed metadata, keep Spark-side schema/partitioning real, and
run decode / feature-extraction / frame-sampling as vectorized Python over
Arrow batches. The actual media codecs are NOT in this container, so the
real decode is stubbed behind an import-try (`decode_image` below raises
NotImplementedError without PIL); the feature extractor used by the query is
a deterministic fake (byte length, md5, synthetic dims) so the whole
mapInPandas path — batch iteration, schema contract, column pruning before
the Python boundary — is exercised and ORACLE-CHECKED, not just smoke-run.

Payloads are synthesized from the documents fixture (utf-8 bytes of text):
no binary fixture exists, and ASCII text means md5(bytes) == md5(text), so
DuckDB can verify the Python-side extraction exactly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from . import register

try:  # pragma: no cover - PIL is absent in this environment
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(payload: bytes):
    """Real image decode — requires PIL, which this container does not ship.

    The Spark-side contract (binary in, (H, W, C) array out via a Pandas
    UDF) is what matters for the pipeline; see _extract_features for the
    deterministic stand-in used by the oracle-checked query.
    """
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode needs PIL; payload plumbing is exercised via the "
            "deterministic extractor instead"
        )
    raise NotImplementedError("real decode intentionally out of scope")


_FEATURES_SCHEMA = (
    "doc_id long, n_bytes int, payload_md5 string, fake_width int, "
    "fake_height int, n_frames int, n_sampled int"
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode': deterministic pseudo-metadata per payload.
    Every output column is a pure function of the bytes, so DuckDB can
    recompute it and the driver's value-hash check applies to a Python
    stage."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "fake_width": (320 + n_bytes % 320).astype("int32"),
                "fake_height": (240 + (n_bytes * 7) % 240).astype("int32"),
                "n_frames": (1 + n_bytes % 48).astype("int32"),
                "n_sampled": (1 + (1 + n_bytes % 48 - 1) // 8).astype("int32"),
            }
        )


_MM_ORACLE = """
    SELECT doc_id,
           CAST(LENGTH(text) AS INT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(320 + LENGTH(text) % 320 AS INT) AS fake_width,
           CAST(240 + (LENGTH(text) * 7) % 240 AS INT) AS fake_height,
           CAST(1 + LENGTH(text) % 48 AS INT) AS n_frames,
           CAST(1 + FLOOR((LENGTH(text) % 48) / 8.0) AS INT) AS n_sampled
    FROM documents
    """


@register("multimodal_features", _MM_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → per-item features through mapInPandas: the scan
    projects exactly (doc_id, payload) before the Python boundary (column
    pruning stays effective), batches cross via Arrow, and the extractor is
    deterministic so the whole Python stage is value-verified by the DuckDB
    oracle."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(_extract_features, _FEATURES_SCHEMA)
