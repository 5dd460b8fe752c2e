"""Cluster-scale join/write techniques: bucketed co-location and skew salting.

These are the two levers the 100 TB posture notes reference that need real
code, not just configuration:

- **Bucketed co-located joins.** A fact table re-joined on the same key
  across many queries should be written ``bucketBy(key)`` once; every later
  equi-join or aggregation on that key then runs WITHOUT an exchange (the
  scan itself satisfies the required hash distribution). At 100 TB that
  converts the dominant shuffle of every downstream job into a one-time
  write cost. Verified by ``tests/test_scale_techniques.py``: the executed
  join plan of two bucketed tables carries zero ``Exchange``.

- **Skew salting.** AQE's skew-join splitting handles most skew at runtime,
  but it cannot split a single hot KEY GROUP of a shuffled aggregation or a
  broadcast-ineligible join. ``salted_join`` spreads each hot key over
  ``n_salts`` sub-keys (fact side salted uniformly, dim side replicated), so
  no single task owns a whole hot key. Result-identical to the plain join —
  asserted by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: "str | tuple[str, ...] | list[str]",
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and per-file sorted) by ``key`` —
    a single column name or a sequence for composite bucket keys (e.g. the
    LSH band index relations bucket on ``(band, sig)``).

    ``bucketBy`` requires a managed table (``saveAsTable``); pick the
    database/location with a qualified ``table`` name. ``sortBy`` additionally
    pre-sorts within buckets so sort-merge joins skip their sort too.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)


_SALT_SAFE_JOINS = {"inner", "left", "left_outer", "leftouter", "left_semi",
                    "leftsemi", "left_anti", "leftanti"}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: salt the (possibly hot-keyed) ``fact`` side,
    replicate ``dim`` across all salts, join on ``(on, salt)``.

    The salt must differ among rows sharing a join key, but its value is
    otherwise irrelevant — derived from ``monotonically_increasing_id`` so it
    needs no data column and adds no shuffle of its own. Replication
    multiplies only the DIM side by ``n_salts``; dims are the small side by
    definition, and stay broadcast-eligible.

    Only fact-preserving join types are accepted: under right/full outer
    joins the replicated dim side would emit one null-extended row per
    unmatched (key, salt) pair — n_salts copies of what the plain join
    returns once — so those types are rejected rather than silently wrong.
    """
    if how.lower() not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_JOINS)} only, not {how!r}: "
            "dim-side replication breaks right/full outer semantics"
        )
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    f = fact.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [on, "__salt"], how).drop("__salt")


# Hinted-broadcast safety cap. An explicit broadcast hint is OBEYED regardless
# of relation size: the build side is collected to the driver (bounded by
# spark.driver.maxResultSize, 1 GiB default) and the hashmap replicated to
# every executor. 384 MiB of ESTIMATED row payload leaves ~2-3x headroom under
# both limits after serialization overhead. Callers estimate with
# rows x bytes-per-row from parquet footer counts (sources.tables.table_rows).
BROADCAST_CAP_BYTES = 384 << 20


def broadcast_if_small(df: DataFrame, est_bytes: int,
                       cap: int = BROADCAST_CAP_BYTES) -> DataFrame:
    """Broadcast hint, size-gated: hint only when the estimated build-side
    payload is safely driver-collectable; otherwise return ``df`` unhinted so
    Catalyst plans a shuffle join (and AQE may still broadcast at runtime
    from observed stats — the gate removes only the unsafe FORCED path).

    Found the hard way on the sf100 ladder: an unconditional
    ``F.broadcast(bridge)`` on a one-row-per-order relation worked through
    sf10 (~240 MB) and died at sf100 (~2.4 GB > spark.driver.maxResultSize).
    Every broadcast of a relation whose cardinality grows with a FACT table
    must come through this gate; fixed-cardinality dims (nation, region,
    equation registry) may hint directly.
    """
    return F.broadcast(df) if est_bytes < cap else df
