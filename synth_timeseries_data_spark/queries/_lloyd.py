"""Shared Lloyd k-means machinery for the embedding-space family.

kmeans_embed (queries/corpus_mining.py) exposes the clustering as an
oracle-checked relation; vec_topk_ivf_trained and semdedup consume the
SAME trained solution as their coarse quantizer (VERDICT r08 item 4). The
chain lives here, outside both modules, because corpus_mining imports
corpus_ext — a quantizer import in the other direction would cycle.

Two bit-equal forms of the same arithmetic:

- ``_km_cent_chain``: the iteration budget UNROLLED into declarative CTE
  text (dialect-injected) — the gate-scale form both engines run, so the
  DuckDB oracles replay training end to end inside one statement;
- ``_km_trained_centroids_numpy``: per-round Arrow-batched numpy
  assignment + one SQL micro-mean update whose K*dims rows are the only
  driver reads — the scale form past the interpreted-HOF cliff
  (corpus_mining._KM_NUMPY_ROWS), term-for-term the same FLOOR-micro
  integer arithmetic (pinned bit-equal in tests/test_ann_recall.py and
  tests/test_corpus_ext.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .llm_pipeline import _SPARK_D

_KM_K = 8
_KM_ITERS = 3
_KM_DIMS = 64
# Quantizer training past this many vectors runs on a deterministic stride
# SUBSAMPLE (the FAISS posture: the coarse quantizer saturates long before
# the corpus does, and training cost is n_train × K per round). Gate scales
# sit far below the cap, so the declarative-chain twin and every oracle are
# unaffected; the scale regime (which has no oracle by design) trades
# nothing measurable for an n-independent build.
_KM_TRAIN_CAP = 65536


def _km_fold(d, ea: str, cw: str) -> str:
    """Exact squared-distance as a BIGINT micro sum: per-dim FLOOR-micro
    terms accumulated left-to-right (order-independent integer adds).
    Spark side pairs the arrays with zip_with instead of indexed
    element_at lookups — measured 6.3 -> 4.4 s steady at the 50k-vector
    tier (interleaved A/B), identical per-term arithmetic and order."""
    if d is _SPARK_D:
        return (
            f"aggregate(zip_with({ea}, {cw}, (x, y) -> "
            f"CAST(FLOOR((x - y) * (x - y) * 1000000.0) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, z) -> acc + z)"
        )
    term = (
        f"CAST(FLOOR(({ea}[i] - {cw}[i]) * ({ea}[i] - {cw}[i]) * "
        f"1000000.0) AS BIGINT)"
    )
    return (
        f"list_sum(list_transform(generate_series(1, {_KM_DIMS}), "
        f"i -> {term}))"
    )


def _km_cent_chain(d, k: int = _KM_K, iters: int = _KM_ITERS, prefix: str = ""):
    """The unrolled Lloyd chain as ``(cte_list, trained_centroid_select)``.

    ``cte_list`` ends at the final assignment ``a{iters}`` (what
    ``_kmeans_sql`` selects from); ``trained_centroid_select`` is the one
    more centroid update over that assignment, yielding the fully trained
    quantizer relation (c, dim, w) that IVF/semdedup consumers slot in
    where their LCG centroids stood. Parameterized on K so a consumer can
    request its own cell count; every expression keeps the FLOOR-micro
    integer discipline, so the chain is engine-bit-exact at any (k, iters).
    """
    spark = d is _SPARK_D
    posexp = (
        "SELECT vec_id, pos + 1 AS dim, CAST(x AS DOUBLE) AS x "
        "FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, x"
        if spark
        else "SELECT vec_id, generate_subscripts(embedding, 1) AS dim, "
        "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings"
    )
    to_double = (
        "transform(embedding, x -> CAST(x AS DOUBLE))"
        if spark
        else "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    )
    cent_arr = (
        "transform(array_sort(collect_list(named_struct('dim', dim, "
        "'w', w))), s -> s.w)"
        if spark
        else "list(w ORDER BY dim)"
    )
    # centroid coordinate: exact-integer numerator over a double product
    # (CAST both operands — a bare 1000000.0 is DECIMAL in DuckDB and
    # flips the division onto the exact-decimal path, the documented
    # cross-engine divergence class)
    w_mean = (
        "CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS DOUBLE)"
        " / (CAST(COUNT(*) AS DOUBLE) * CAST(1000000.0 AS DOUBLE))"
    )
    p = prefix
    ctes = [
        f"""{p}v AS (SELECT vec_id, {to_double} AS ea FROM embeddings),
    {p}comps AS ({posexp}),
    {p}sel8 AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}),
    {p}sel AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
      FROM {p}sel8
    ),
    {p}c0 AS (SELECT s.c, e.ea AS cw
              FROM {p}v e JOIN {p}sel s ON s.vec_id = e.vec_id)"""
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""{p}a{t} AS (
      SELECT e.vec_id, MIN({_km_fold(d, 'e.ea', 'ct.cw')} * {k} + ct.c)
               AS kk
      FROM {p}v e CROSS JOIN {p}c{t - 1} ct
      GROUP BY e.vec_id
    )"""
        )
        if t < iters:
            ctes.append(
                f"""{p}c{t} AS (
      SELECT c, {cent_arr} AS cw
      FROM (SELECT a.kk % {k} AS c, p.dim, {w_mean} AS w
            FROM {p}comps p JOIN {p}a{t} a ON a.vec_id = p.vec_id
            GROUP BY a.kk % {k}, p.dim) m
      GROUP BY c
    )"""
            )
    trained = f"""SELECT a.kk % {k} AS c, p.dim, {w_mean} AS w
      FROM {p}comps p JOIN {p}a{iters} a ON a.vec_id = p.vec_id
      GROUP BY a.kk % {k}, p.dim"""
    return ctes, trained


def _km_assign_numpy(df, cents):
    """One Lloyd assignment pass as Arrow-batched mapInPandas: the EXACT
    arithmetic of _km_fold, vectorized — float64 (x-w)^2 * 1e6 floored to
    int64 per dim (IEEE-identical to the SQL form term by term), summed
    exactly, argmin encoded as MIN(d2*K + c).

    The centroid axis is processed in 64-row BLOCKS (the _sd_assign_numpy
    device): the unblocked (batch, K, dims) broadcast subtract is ~5 GB of
    float64 intermediate per 10k-row Arrow batch at semdedup's K=1024
    scale tier — blocking bounds it at batch×64×dims regardless of K.
    Strict `<` on the running minimum keeps ties on the LOWER block, so
    the blocked composite equals the one-shot (d2*K + c) min exactly."""
    import numpy as np
    import pandas as pd

    C = cents  # (k, dims) float64; closure-captured, k*dims scalars
    k = C.shape[0]

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            best_d = np.full(len(pdf), np.iinfo(np.int64).max, dtype=np.int64)
            best_c = np.zeros(len(pdf), dtype=np.int64)
            for lo in range(0, k, 64):
                Cb = C[lo : lo + 64]
                # In-place ops + float64 reduction: each floored term is an
                # exact small integer and 64 of them stay far below 2^53,
                # so summing in float64 is EXACT (same integer the int64
                # sum produces) while skipping the (batch, K, dims) int64
                # materialization — the K=1024 build was measured memory-
                # bandwidth-bound (137 s/round at 200k vectors) on exactly
                # those intermediate tensors.
                diff = E[:, None, :] - Cb[None, :, :]
                np.multiply(diff, diff, out=diff)
                np.multiply(diff, 1e6, out=diff)
                np.floor(diff, out=diff)
                d2 = diff.sum(axis=2).astype(np.int64)
                blk_c = d2.argmin(axis=1)
                blk_d = d2[np.arange(len(pdf)), blk_c]
                upd = blk_d < best_d  # strict: ties keep the lower block
                best_d = np.where(upd, blk_d, best_d)
                best_c = np.where(upd, blk_c + lo, best_c)
            kk = best_d * k + best_c
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "kk": kk})

    return df.mapInPandas(assign, schema="vec_id long, kk long")


def _km_trained_centroids_numpy(
    spark: SparkSession, sf_dir: str, k: int = _KM_K, iters: int = _KM_ITERS
):
    """The scale form of the trained quantizer: _kmeans_numpy's per-round
    numpy assignment + SQL micro-mean update, run through the FINAL update
    (the quantizer is the k-means solution, not the last pre-assignment
    centroids). Returns {cluster_id: float64[dims]} — K*dims planning
    scalars, the legitimate index-build collect. Arithmetic is term-for-
    term the declarative chain's (FLOOR-micro int64 distances, exact
    integer numerators over double denominators), so the two forms agree
    bit-for-bit — pinned in tests/test_ann_recall.py and
    tests/test_corpus_ext.py. Parameterized on (k, iters) so semdedup can
    train its own corpus-scaled cell count."""
    import numpy as np

    from ..sources import load

    # Repartition BEFORE the per-round assignment kernel: the embeddings
    # scan yields only ~2 file-split partitions at the 200k tier (one
    # 100 MB parquet), so the compute-heavy mapInPandas ran ~2-way —
    # measured 350 s for the K=1024 3-round build; core-count partitions
    # make the assignment rounds actually parallel (the AQE-coalesce
    # caveat from the verify notes, applied at the source).
    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    n = emb.count()
    train = emb
    if n > _KM_TRAIN_CAP:
        # deterministic stride sample, id-spread (not a prefix — the
        # scaled fixtures cluster by id range): every ceil(n/cap)-th id
        stride = -(-n // _KM_TRAIN_CAP)
        train = emb.where(f"vec_id % {stride} = 0").localCheckpoint()
    seeds = train.orderBy("vec_id").limit(k).collect()
    cents = {
        c: np.asarray(r.embedding, dtype=np.float64)
        for c, r in enumerate(seeds)
    }
    dims = len(next(iter(cents.values())))
    import uuid

    for t in range(1, iters + 1):
        C = np.stack([cents[c] for c in sorted(cents)])
        cmap = sorted(cents)
        a = _km_assign_numpy(train, C)
        kc = len(cmap)  # compact centroid count (clusters can drop out)
        view = f"_ivft_assign_{uuid.uuid4().hex[:12]}"
        a.createOrReplaceTempView(view)
        train.createOrReplaceTempView(f"{view}_e")
        rows = spark.sql(
            f"""
            SELECT CAST(a.kk % {kc} AS INT) AS c, p.dim,
                   SUM(CAST(FLOOR(p.x * 1000000.0) AS BIGINT)) AS sx,
                   COUNT(*) AS n
            FROM (SELECT vec_id, pos + 1 AS dim, CAST(x AS DOUBLE) AS x
                  FROM {view}_e LATERAL VIEW posexplode(embedding) AS pos, x
                 ) p
            JOIN {view} a ON a.vec_id = p.vec_id
            GROUP BY a.kk % {kc}, p.dim
            """
        ).collect()  # K*dims planning scalars, never data
        spark.catalog.dropTempView(view)
        spark.catalog.dropTempView(f"{view}_e")
        upd: dict = {}
        for r in rows:
            upd.setdefault(cmap[r.c], np.zeros(dims))[r.dim - 1] = (
                float(r.sx) / (r.n * 1e6)
            )
        cents = upd
    return cents


def trained_centroid_values(cents) -> str:
    """Render a trained centroid dict as a dialect-neutral VALUES relation
    text ``(VALUES ...) AS t(c, dim, w)``. ``repr`` round-trips binary64
    exactly and both engines parse the literal to the identical double, so
    inlining loses nothing."""
    rows = ", ".join(
        # float(w): the values arrive as numpy float64 scalars, whose repr
        # under NumPy >= 2 (NEP 51) is 'np.float64(x)' — unparseable SQL
        f"({c}, {dim + 1}, {float(w)!r})"
        for c in sorted(cents)
        for dim, w in enumerate(cents[c])
    )
    return f"(VALUES {rows}) AS t(c, dim, w)"
