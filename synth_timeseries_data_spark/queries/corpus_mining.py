"""Corpus-mining operators, round 8 (EXT surface, first-class at 100 TB):
winnowing fingerprints, the full Gopher repetition suite, line-grain
corpus dedup, embedding k-means, and tokenizer statistics.

These complete two families the earlier EXT rounds opened:

- the DEDUP GRAIN ladder — doc grain (minhash/simhash/embed), span grain
  (dedup_spans), and now LINE grain (`line_dedup`, the C4/CCNet move) plus
  document FINGERPRINT SELECTION (`winnowing`, Schleimer et al. SIGMOD'03
  — the MOSS scheme; local fingerprinting is what an incremental dedup
  service stores instead of full shingle sets);
- the QUALITY GATE ladder — gopher_rules covers the document-shape gates;
  `gopher_repetition` adds the paper's repetition table (top-n-gram and
  duplicate-n-gram coverage, duplicate-line fractions) that Gopher,
  RefinedWeb and Dolma all apply before any model-based scoring;
- plus `kmeans_embed` (explicit Lloyd clustering over the embedding
  column — the coarse structure semdedup/vec_topk_ivf consume as a given,
  here produced as a first-class, oracle-checked relation) and
  `tokenizer_stats` (per-language fertility/compression of the BPE
  surface — the metric tokenizer training actually reads).

Design rules are inherited from llm_pipeline.py / corpus_ext.py: every
operator is a dialect-shared SQL template (Spark + DuckDB oracle) unless
the Spark side has a measurably better zero-shuffle form (then the oracle
keeps the independent relational form, the repetition_ratio precedent);
ratios are exact-integer quotients emitted as raw doubles; sums feeding
decisions accumulate as FLOOR-micro bigints; every ordering carries a
unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register
from .corpus_ext import _joinarr, _slice
from .llm_pipeline import (
    _DUCK_D,
    _SPARK_D,
    _dual,
    _hex2int,
    _spark_docs,
)

# --------------------------------------------------------------------------
# winnowing: MOSS fingerprint selection (Schleimer, Wilkerson, Aiken 2003).
# k-gram rolling hashes, sliding window of w hash positions, select each
# window's minimum — the guarantee: any shared run of w+k-1 tokens between
# two documents shares at least one selected fingerprint, while only
# ~2/(w+1) of positions are stored. This is the sub-quadratic storage side
# of exact-substring dedup: dedup_spans compares ALL run hashes; a serving
# index stores only winnowed fingerprints.
# --------------------------------------------------------------------------

_WIN_K = 5  # tokens per k-gram
_WIN_W = 4  # hashes per winnowing window
# position packed into the low 24 bits of the composite (docs are capped at
# 2^24 gram positions ≈ 16.7M tokens per document — far above any training
# document; the cap is a documented constant, not a silent truncation)
_WIN_POS = 1 << 24


def _winnowing_sql(d) -> str:
    # The rightmost-min tiebreak is ENCODED IN THE VALUE: the composite
    # v = h36 * 2^24 + (2^24 - 1 - i) — 36-bit hash + 24-bit position =
    # 60 bits, no int64 overflow — is strictly decreasing in i for equal
    # hashes, so MIN(v) over a window IS the rightmost minimal hash and no
    # separate argmin machinery (or engine-specific min_by tie rule) is
    # needed. v is unique per (doc, i), so window minima are unambiguous
    # and both engines decode identical (fp, pos) pairs from identical v.
    ws = d["split"]("text")
    gram = _joinarr(d, _slice(d, "ws", "i", _WIN_K))
    h36 = _hex2int(d, f"SUBSTR(md5({gram}), 1, 9)")
    idiv = "DIV" if d is _SPARK_D else "//"
    return f"""
    WITH w AS (
      SELECT doc_id, {ws} AS ws FROM {d['pdocs']}
      WHERE text IS NOT NULL AND {d['len'](ws)} >= {_WIN_K}
    ),
    pos AS (SELECT doc_id, ws, {d['len']('ws')} - {_WIN_K - 1} AS n,
                   {d['expand']('1', d['len']('ws') + f' - {_WIN_K - 1}')} AS i
            FROM w),
    hv AS (
      SELECT doc_id, i, n,
             {h36} * {_WIN_POS} + ({_WIN_POS - 1} - i) AS v
      FROM pos
    ),
    wm AS (
      SELECT doc_id, i, n,
             MIN(v) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN {_WIN_W - 1} PRECEDING
                          AND CURRENT ROW) AS wv
      FROM hv
    )
    SELECT DISTINCT doc_id,
           CAST(wv {idiv} {_WIN_POS} AS BIGINT) AS fp,
           CAST({_WIN_POS - 1} - (wv % {_WIN_POS}) AS INT) AS pos
    FROM wm
    WHERE i >= {_WIN_W} OR i = n
    """


_WINNOW_SPARK, _WINNOW_DUCK = _dual(_winnowing_sql)


@register("winnowing", _WINNOW_DUCK)
def winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-EXT: winnowing document fingerprints (Schleimer et al.,
    SIGMOD 2003 — the MOSS scheme). Token 5-gram hashes, sliding window
    of 4; each window's minimum hash is selected, rightmost-min on ties
    (encoded arithmetically in the composite value, see the template
    comment), yielding the guarantee that any w+k-1 = 8-token run shared
    between two documents shares a selected fingerprint while only
    ~2/(w+1) = 40% of positions are stored. Documents shorter than one
    full window emit the minimum over their partial window (coverage for
    short docs); documents under k tokens have no k-grams and emit
    nothing. Returns the fingerprint relation (doc_id, fp, pos) — what a
    dedup serving index persists instead of full shingle sets.

    Scale shape: one position explode (linear in tokens), ONE doc-keyed
    window exchange (per-doc sort by position; skew bound = longest
    single document, the same bound dedup_spans' rebuild carries), and
    the final DISTINCT runs WITHOUT a second exchange — doc_id hash
    partitioning already co-locates every (doc_id, v) group, which
    Catalyst recognizes (plan-asserted in tests/test_plans.py). Nothing
    is corpus-quadratic; fingerprint volume is ~0.4× gram volume."""
    return _spark_docs(spark, sf_dir, _WINNOW_SPARK)
