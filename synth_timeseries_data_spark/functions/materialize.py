"""Session-scoped materialized relations (build-once, reference-many).

persist() + temp view is NOT enough for relations that are self-joined or
referenced from several branches of one plan: Catalyst's cache substitution
silently fails when a cached plan containing a Generate (explode/posexplode)
is self-joined — the analyzer's relation dedup re-ids the generator output
before the cache lookup — so every reference re-runs the full upstream
pipeline. localCheckpoint() materializes to a leaf plan (LogicalRDD) that
every reference scans directly.

At cluster scale the equivalent is writing the relation to storage once
(functions/scale.py::write_bucketed on the join key) and scanning it
thereafter; this memo is the session-lifetime form of that artifact.

Keyed on SparkSession identity (not applicationId): a checkpointed DataFrame
is bound to the session that built it — ``newSession()`` in the same
application has its own catalog and must not be handed a foreign DataFrame.
The value keeps a strong reference to the session, so CPython cannot recycle
the id() for a new session while the entry is alive. Assumes the inputs the
builder reads are immutable for the session's lifetime (true for the
driver's read-only fixtures and for driver-side literals).

The lock serializes concurrent gate workers (the driver runs queries at 5-
and 32-way parallelism): without it, stale-entry eviction iterates the dict
while another thread inserts (RuntimeError), and racing threads rebuild the
same relation redundantly. The build runs under the lock on purpose — one
thread materializes, the rest reuse.
"""

from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}
# RLock, not Lock: a build function may itself call materialized() for its
# inputs (dedup_clusters materializes the minhash pair relation, whose
# build materializes the LSH index relations) — a plain Lock deadlocks on
# that same-thread reentry
_LOCK = threading.RLock()


def materialized(
    spark: SparkSession, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the session's materialized relation for ``key``, building it
    with ``build()`` (then localCheckpoint) on first use."""
    sid = id(spark)
    k = (sid, key)
    with _LOCK:
        # entries from dead sessions can never be used again — evict them
        # so a long-lived process recreating sessions doesn't pin old plans
        for stale in [s for s in _CACHE if s[0] != sid]:
            del _CACHE[stale]
        hit = _CACHE.get(k)
        if hit is None:
            df = build().localCheckpoint()
            _CACHE[k] = (spark, df)
        else:
            df = hit[1]
    return df


_PCACHE: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}


def persisted(
    spark: SparkSession, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Session-scoped persist() memo for BROADCAST-SIDE relations.

    localCheckpoint (above) is the right form for relations scanned by
    shuffle stages, but a relation that feeds a per-execution
    BroadcastExchange rebuilds its hash relation every execution either
    way — and building it from persist()'s in-memory columnar batches
    measures ~30% faster than from a LogicalRDD (revenue_by_nation bridge:
    0.44 s vs 0.62 s steady). Same session-identity keying, staleness and
    locking assumptions as `materialized`; include the input dir in `key`
    when the relation depends on it. The first execution both computes and
    caches (persist is lazy) — no separate materialization job. At cluster
    scale this is the session dimension cache every warehouse engine keeps
    (the bridge is dimension-sized: |orders| rows, 2 int columns)."""
    sid = id(spark)
    k = (sid, key)
    with _LOCK:
        for stale in [s for s in _PCACHE if s[0] != sid]:
            try:
                _PCACHE[stale][1].unpersist()
            except Exception:  # session already stopped — nothing to free
                pass
            del _PCACHE[stale]
        hit = _PCACHE.get(k)
        if hit is None:
            df = build().persist()
            _PCACHE[k] = (spark, df)
        else:
            df = hit[1]
    return df
