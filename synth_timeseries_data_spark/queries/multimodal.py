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


def parse_image_header(payload: bytes) -> tuple[int, int, str]:
    """(width, height, format) from the container header — pure Python, no
    codec. This is the dependency-free path real pipelines use for
    metadata-only passes (dimension filters, aspect bucketing) where a full
    pixel decode would waste the whole batch budget. Supports the formats
    whose dimensions live at fixed/walkable offsets: PNG (IHDR), GIF
    (logical screen descriptor), BMP (BITMAPINFOHEADER), JPEG (SOF marker
    walk). Raises ValueError for anything else — including a recognized
    magic over a TRUNCATED header (struct.error is translated, so callers
    can catch one exception type as documented)."""
    import struct

    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack(">II", payload[16:24])
            return w, h, "png"
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", payload[6:10])
            return w, h, "gif"
        if payload[:2] == b"BM":
            w, h = struct.unpack("<ii", payload[18:26])
            return w, abs(h), "bmp"
        if payload[:2] == b"\xff\xd8":  # JPEG: walk markers to the first SOF
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    break
                # ITU T.81 B.1.1.2: any number of 0xFF FILL bytes may pad a
                # marker — skip them, or a spec-valid file would misread the
                # real marker byte as a length field and walk into garbage.
                while i + 9 < len(payload) and payload[i + 1] == 0xFF:
                    i += 1
                marker = payload[i + 1]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return w, h, "jpeg"
                # ITU T.81 B.1.1.4: TEM (0x01) and RSTn/SOI/EOI (0xD0-0xD9)
                # are STANDALONE markers with no length field — reading
                # their payload bytes as a length would walk into garbage.
                # None can precede SOF in a well-formed header (RSTs live
                # inside scan data), so an unwalkable file raises the
                # documented ValueError instead.
                if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                    raise ValueError(
                        f"standalone marker 0x{marker:02x} before SOF"
                    )
                i += 2 + struct.unpack(">H", payload[i + 2 : i + 4])[0]
            raise ValueError("jpeg without SOF marker")
    except struct.error as e:
        raise ValueError(f"truncated image header: {e}") from e
    raise ValueError("unrecognized image container")


def decode_image(payload: bytes):
    """Full pixel decode — PIL-backed; this container does not ship PIL, so
    without it the call raises NotImplementedError (documented stub). With
    PIL present it returns the decoded ``PIL.Image`` (callers take
    ``.size`` / ``numpy.asarray`` from it); the PIL-present test asserts
    its dimensions agree with :func:`parse_image_header`'s header-only
    path. The Spark-side contract (binary in, typed features out via an
    Arrow-batched UDF) is exercised year-round by the oracle-checked
    deterministic extractor below either way."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode needs PIL; payload plumbing is exercised via the "
            "deterministic extractor instead"
        )
    import io

    img = Image.open(io.BytesIO(bytes(payload)))
    img.load()
    return img


_FEATURES_SCHEMA = (
    "doc_id long, n_bytes int, payload_md5 string, fake_width int, "
    "fake_height int, n_frames int, n_sampled int, resize_w int, resize_h int"
)

_RESIZE_TARGET = 224


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode': deterministic pseudo-metadata per payload.
    Every output column is a pure function of the bytes, so DuckDB can
    recompute it and the driver's value-hash check applies to a Python
    stage. resize_w/h is the aspect-preserving fit into 224×224 computed in
    pure integer arithmetic (engine-exact, no float rounding)."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        w = 320 + n_bytes % 320
        h = 240 + (n_bytes * 7) % 240
        landscape = w >= h
        resize_w = landscape * _RESIZE_TARGET + (~landscape) * (
            w * _RESIZE_TARGET // h
        )
        resize_h = landscape * (h * _RESIZE_TARGET // w) + (~landscape) * _RESIZE_TARGET
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "fake_width": w.astype("int32"),
                "fake_height": h.astype("int32"),
                "n_frames": (1 + n_bytes % 48).astype("int32"),
                "n_sampled": (1 + (1 + n_bytes % 48 - 1) // 8).astype("int32"),
                "resize_w": resize_w.astype("int32"),
                "resize_h": resize_h.astype("int32"),
            }
        )


_MM_ORACLE = f"""
    WITH dims AS (
      SELECT doc_id, text,
             CAST(LENGTH(text) AS INT) AS n_bytes,
             320 + LENGTH(text) % 320 AS w,
             240 + (LENGTH(text) * 7) % 240 AS h
      FROM documents
    )
    SELECT doc_id,
           n_bytes,
           md5(text) AS payload_md5,
           CAST(w AS INT) AS fake_width,
           CAST(h AS INT) AS fake_height,
           CAST(1 + n_bytes % 48 AS INT) AS n_frames,
           CAST(1 + FLOOR((n_bytes % 48) / 8.0) AS INT) AS n_sampled,
           CAST(CASE WHEN w >= h THEN {_RESIZE_TARGET}
                     ELSE FLOOR(w * {_RESIZE_TARGET} / h) END AS INT) AS resize_w,
           CAST(CASE WHEN w >= h THEN FLOOR(h * {_RESIZE_TARGET} / w)
                     ELSE {_RESIZE_TARGET} END AS INT) AS resize_h
    FROM dims
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


# --------------------------------------------------------------------------
# Frame sampling: one output row per SAMPLED frame (stride 8) — the
# video-pipeline batch shape where the Python stage fans each input out to
# multiple rows. Frames are fixed-length byte slices of the payload
# (deterministic stand-in for real frame extraction); each sampled frame is
# content-hashed, so DuckDB re-derives the identical rows from substr+md5
# and the fan-out Python stage is value-verified end to end.
# --------------------------------------------------------------------------

_FRAME_STRIDE = 8

_FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset int, frame_len int, "
    "frame_md5 string"
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "frame_idx": [], "frame_offset": [],
            "frame_len": [], "frame_md5": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n = len(b)
            n_frames = 1 + n % 48
            flen = max(1, n // n_frames)
            for idx in range(0, n_frames, _FRAME_STRIDE):
                off = idx * flen
                sl = b[off : off + flen]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_offset"].append(off)
                out["frame_len"].append(len(sl))
                out["frame_md5"].append(hashlib.md5(sl).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_offset": pd.Series(out["frame_offset"], dtype="int32"),
                "frame_len": pd.Series(out["frame_len"], dtype="int32"),
                "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
            }
        )


_FRAMES_ORACLE = f"""
    WITH meta AS (
      SELECT doc_id, text,
             LENGTH(text) AS n,
             1 + LENGTH(text) % 48 AS n_frames,
             GREATEST(1, CAST(FLOOR(LENGTH(text) / (1 + LENGTH(text) % 48)) AS INT)) AS flen
      FROM documents
    ),
    frames AS (
      SELECT doc_id, text, n, flen,
             unnest(generate_series(0, n_frames - 1, {_FRAME_STRIDE})) AS frame_idx
      FROM meta
    )
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * flen AS INT) AS frame_offset,
           CAST(LENGTH(substr(text, frame_idx * flen + 1, flen)) AS INT) AS frame_len,
           md5(substr(text, frame_idx * flen + 1, flen)) AS frame_md5
    FROM frames
    """


@register("multimodal_framesample", _FRAMES_ORACLE)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over binary payloads via mapInPandas — the
    one-to-many Python batch shape (each payload fans out to its sampled
    frames, content-hashed per frame). ASCII payloads make byte slices equal
    char slices, so the oracle re-derives every row with substr+md5."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(_sample_frames, _FRAMES_SCHEMA)


# --------------------------------------------------------------------------
# Audio: dependency-free WAV (RIFF) container parsing + metadata extraction
# (round 7) — the audio leg of the multimodal pattern. The payload is a
# VALID canonical PCM WAV synthesized per doc (utf-8 text bytes as sample
# data, format parameters derived from doc_id), the Python stage parses it
# back with the chunk walker below — exercising real container plumbing —
# and every output column is integer-derivable from (doc_id, length(text)),
# so DuckDB value-verifies the whole mapInPandas stage.
# --------------------------------------------------------------------------


def parse_audio_header(payload: bytes) -> tuple[int, int, int, int]:
    """(n_channels, sample_rate_hz, bits_per_sample, n_frames) from a
    RIFF/WAVE container — pure Python, no codec, the metadata-only pass a
    real pipeline runs before deciding what to hand the decoder. Walks
    chunks (skipping LIST/fact/etc. with RIFF's odd-size pad byte) until
    both `fmt ` and `data` are seen; raises ValueError on anything that is
    not a walkable PCM WAV."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    # struct.error is translated so callers filtering a real corpus of
    # malformed payloads can catch ONE exception type, as documented
    # (same contract as parse_image_header).
    try:
        pos, fmt, data_size = 12, None, None
        while pos + 8 <= len(payload) and (fmt is None or data_size is None):
            cid, size = payload[pos : pos + 4], struct.unpack(
                "<I", payload[pos + 4 : pos + 8]
            )[0]
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                if size < 16 or len(body) < 16:
                    raise ValueError("fmt chunk too short")
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                if pos + 8 + size > len(payload):
                    # Declared sample bytes exceed the container — a
                    # truncated file. Reporting n_frames from the declared
                    # size would promise frames that aren't there; fail
                    # loudly like every other inconsistency here.
                    raise ValueError("truncated data chunk")
                data_size = size
            pos += 8 + size + (size % 2)  # chunks are word-aligned
    except struct.error as exc:
        raise ValueError(f"unwalkable WAV header: {exc}") from exc
    if fmt is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, rate, _brate, block_align, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"not PCM (fmt tag {audio_fmt})")
    if (
        channels < 1
        or bits < 8
        or block_align < 1
        or block_align != channels * (bits // 8)
    ):
        raise ValueError("inconsistent fmt chunk")
    return channels, rate, bits, data_size // block_align


def make_wav(data: bytes, channels: int, rate: int, bits: int = 16) -> bytes:
    """Canonical PCM WAV container around ``data`` (padded to the block
    size) — the synthesizer for the audio query and its tests."""
    import struct

    block = channels * (bits // 8)
    if len(data) % block:
        data = data + b"\x00" * (block - len(data) % block)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


_AUDIO_SCHEMA = (
    "doc_id long, n_channels int, sample_rate_hz int, bits int, "
    "n_frames long, duration_us long, byte_sum long"
)


def _extract_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows: dict[str, list] = {k.split()[0]: [] for k in _AUDIO_SCHEMA.split(", ")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            channels = 1 + doc_id % 2
            rate = 8000 * (1 + doc_id % 3)
            wav = make_wav(bytes(payload), int(channels), int(rate))
            n_ch, n_rate, bits, n_frames = parse_audio_header(wav)
            data = wav[-n_frames * n_ch * (bits // 8) :] if n_frames else b""
            rows["doc_id"].append(doc_id)
            rows["n_channels"].append(n_ch)
            rows["sample_rate_hz"].append(n_rate)
            rows["bits"].append(bits)
            rows["n_frames"].append(n_frames)
            rows["duration_us"].append(n_frames * 1_000_000 // n_rate)
            rows["byte_sum"].append(
                int(np.frombuffer(data, dtype=np.uint8).sum()) if data else 0
            )
        yield pd.DataFrame(rows).astype(
            {
                "doc_id": "int64", "n_channels": "int32",
                "sample_rate_hz": "int32", "bits": "int32",
                "n_frames": "int64", "duration_us": "int64",
                "byte_sum": "int64",
            }
        )


# Everything the parser reports is integer-derivable from (doc_id,
# length(text)) for the canonical container: block = 2*channels, data is
# text padded to the block, frames = padded_len // block, and the pad
# bytes are zero so byte_sum is the plain text byte sum.
_AUDIO_ORACLE = """
    WITH p AS (
      SELECT doc_id,
             1 + doc_id % 2 AS channels,
             8000 * (1 + doc_id % 3) AS rate,
             LENGTH(text) AS n,
             COALESCE(list_sum(list_transform(
               range(1, LENGTH(text) + 1),
               i -> ord(substr(text, i, 1)))), 0) AS bsum
      FROM documents WHERE text IS NOT NULL
    ),
    f AS (
      SELECT doc_id, channels, rate, bsum,
             (n + ((2 * channels) - n % (2 * channels)) % (2 * channels))
               // (2 * channels) AS n_frames
      FROM p
    )
    SELECT doc_id,
           CAST(channels AS INT) AS n_channels,
           CAST(rate AS INT) AS sample_rate_hz,
           CAST(16 AS INT) AS bits,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_frames * 1000000 // rate AS BIGINT) AS duration_us,
           CAST(bsum AS BIGINT) AS byte_sum
    FROM f
    """


@register("multimodal_audio", _AUDIO_ORACLE)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-column metadata pass: binary WAV payloads → per-item container
    metadata (channels / rate / bits / frames / duration) plus an exact
    PCM byte checksum, through the same Arrow-batched mapInPandas shape as
    multimodal_features — scan pruned to (doc_id, payload) before the
    Python boundary, deterministic synthesis so the container walk itself
    is value-verified cross-engine. At 100 TB this is the metadata-only
    pass (duration filters, rate bucketing) that runs BEFORE any codec is
    paid for."""
    docs = load(spark, sf_dir, "documents").where("text IS NOT NULL").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(_extract_audio, _AUDIO_SCHEMA)
