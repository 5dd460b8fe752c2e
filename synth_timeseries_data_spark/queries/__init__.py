"""Driver-facing query registry.

Each engine operator from SURVEY.md §2 is exposed as a named :class:`Query`
pairing the Spark DataFrame builder with its DuckDB oracle SQL (or ``None``
for genuinely non-SQL-expressible operators, which get a rows-only check).
Keeping the pair in one object is what guarantees the column-name contract:
the driver sorts columns by name before value-hashing, so every computed
column is aliased identically on both sides.

Cross-engine determinism rules (see functions/numeric.py, functions/detrand.py):
- sums/averages of doubles go through exact DECIMAL accumulation;
- time scalars are microsecond-epoch BIGINTs;
- libm-dependent results (sin/cos/ln/corr/stddev/regr_*) are ROUND(.,6);
- every window/top-k ordering carries a unique-key tiebreak.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered views, or None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


# Oracle-checkable queries whose operator coverage is fully duplicated by an
# earlier query (ts_diff ~ sampling_hist for V4; docs_by_lang ~ text_stats;
# topk_value ~ vec_topk_ivf's TakeOrdered; tumbling_agg is the 1-window
# special case of sliding_agg and its true streaming twin has behavior tests;
# vec_topk's brute-force cosine + TakeOrdered surface is fully exercised by
# vec_topk_lsh / vec_topk_ivf / embed_neardup, which all run the same exact
# cosine as their verify stage). Demoted to the end of the oracle block so
# that a driver which checks only the first N registry entries spends its
# window on queries that uniquely cover an operator.
# ngram_jaccard is the bounded brute-force baseline whose inverted-index
# join + exact-Jaccard surface is minhash_dedup's verify stage.
# text_stats' word/uniqueness projections are covered by token_count +
# quality_score; doc_fingerprint's md5 projections by dedup_firstseen +
# hash_split; lang_id's stopword lambda + classification rollup by
# quality_score (same filter lambda, richer aggregate). Demoting these
# keeps the unique-coverage ANN/near-dup/dataset-assembly flagships
# (vec_topk_ivf, embed_neardup, contamination_check) inside a 50-entry
# check window.
# repetition_ratio and char_entropy extend capability breadth but their
# physical surfaces (shingle explode + doc-keyed agg; char explode + agg)
# duplicate minhash_dedup and simhash/token_count, so they join the
# demoted tail rather than displacing unique-coverage queries.
_DEMOTED = (
    "ts_diff",
    "docs_by_lang",
    "topk_value",
    "tumbling_agg",
    "vec_topk",
    "ngram_jaccard",
    "text_stats",
    "doc_fingerprint",
    "lang_id",
    "repetition_ratio",
    "char_entropy",
    "rolling_median",
    "funnel",
    "retention_cohorts",
)


def all_queries() -> dict[str, Query]:
    # Import side-effect modules once, lazily, to populate REGISTRY.
    from . import relational  # noqa: F401
    from . import timeseries  # noqa: F401
    from . import graph  # noqa: F401
    from . import dsl  # noqa: F401
    from . import codec  # noqa: F401
    from . import masks  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import streaming_analog  # noqa: F401
    from . import io_roundtrip  # noqa: F401
    from . import events_ext  # noqa: F401
    from . import projections  # noqa: F401
    from . import llm_pipeline  # noqa: F401
    from . import generation  # noqa: F401

    # The driver verifies registry entries in order and may cap how many it
    # checks, so ordering is part of the contract: every oracle-checkable
    # query first (stable in import order, minus the demoted tail), then the
    # rows-only generation sweeps whose real check is the bit-exact golden
    # suite.
    ordered = sorted(
        REGISTRY.values(),
        key=lambda q: (q.oracle is None, q.name in _DEMOTED),
    )
    return {q.name: q for q in ordered}
