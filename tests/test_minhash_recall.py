"""Recall property of the banded MinHash LSH candidate generator.

The verify stage keeps precision exact (every candidate pair is re-checked
with true Jaccard), so the only tunable risk is RECALL: a true near-dup pair
that never collides in any band is silently lost. With 16 min-hashes in
8 bands of r=2, the textbook collision probability for a pair at Jaccard J
is 1 − (1 − J²)⁸ — ≈0.90 at J=0.5, ≈0.996 at J=0.7. This test pins that
behavior empirically on a constructed corpus of known near-dup pairs, so a
future re-tuning of (_MH_H, _MH_BANDS) or of the hash family (digest
rotations) that silently degrades recall fails here.
"""

from __future__ import annotations

import random

import pytest

from synth_timeseries_data_spark.queries.llm_pipeline import (
    _MH_BANDS,
    _MH_H,
    _SPARK_D,
    _mh_docagg_sql,
    _mh_sigs_sql,
    _minhash_tail,
    _shingles_cte,
    _shingles_raw_cte,
)

N_PAIRS = 40
BASE_WORDS = 60  # → 58 3-shingles per base doc


def _make_corpus():
    """N_PAIRS (base, mutated) doc pairs with true shingle-Jaccard ≥ ~0.5.

    Mutating a suffix of an m-word doc keeps a shared (prefix − 2)-shingle
    core; replacing ~25% of trailing words yields J ≈ 0.55-0.75 — right at
    the advertised 0.5 cut where banded recall matters most.
    """
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(5000)]
    docs = []
    for pid in range(N_PAIRS):
        base = [rng.choice(vocab) for _ in range(BASE_WORDS)]
        keep = int(BASE_WORDS * 0.78)
        mutated = base[:keep] + [rng.choice(vocab) for _ in range(BASE_WORDS - keep)]
        docs.append((2 * pid, " ".join(base)))
        docs.append((2 * pid + 1, " ".join(mutated)))
    return docs


@pytest.fixture(scope="module")
def neardup_view(spark):
    docs = _make_corpus()
    values = ", ".join(f"({i}, '{t}')" for i, t in docs)
    docs = spark.sql(
        f"SELECT * FROM (VALUES {values}) AS documents(doc_id, text)"
    )
    docs.createOrReplaceTempView("documents")
    # the shingle templates read the repartitioned view (_SPARK_D["pdocs"])
    docs.repartition(8, "doc_id").createOrReplaceTempView("documents_par")
    yield
    spark.catalog.dropTempView("documents")
    spark.catalog.dropTempView("documents_par")


def test_banded_minhash_recall(spark, neardup_view):
    sql = (
        _shingles_raw_cte(_SPARK_D)
        + f", docagg AS ({_mh_docagg_sql(_SPARK_D)}),"
        + f" sigs AS ({_mh_sigs_sql(_SPARK_D, 'docagg')}),"
        + _minhash_tail(_SPARK_D, "docagg", "sigs")
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in spark.sql(sql).collect()
    }
    # ground truth: the true-Jaccard >= 0.5 subset of the constructed pairs
    truth_sql = "WITH " + _shingles_cte(_SPARK_D)[9:].strip() + """,
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM shingles a JOIN shingles b
        ON a.s = b.s AND b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b
    FROM inter i JOIN sizes za ON za.doc_id = i.doc_a
                 JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) >= 0.5
    """
    truth = {(r.doc_a, r.doc_b) for r in spark.sql(truth_sql).collect()}
    assert len(truth) >= 20, f"fixture degenerate: only {len(truth)} true pairs"

    found = truth & got
    recall = len(found) / len(truth)
    # expectation at J in [0.5, 0.75] is 0.90-0.999; allow sampling slack
    assert recall >= 0.8, (
        f"banded LSH recall {recall:.2f} ({len(found)}/{len(truth)}) below 0.8 "
        f"with H={_MH_H} bands={_MH_BANDS} — re-tune bands or hash family"
    )

    # precision is exact by construction: every emitted pair really has J >= 0.5
    emitted_truth_sql = truth_sql.replace(
        "b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0", "b.doc_id > a.doc_id"
    )
    all_true = {(r.doc_a, r.doc_b) for r in spark.sql(emitted_truth_sql).collect()}
    assert got <= all_true, f"emitted non-near-dup pairs: {sorted(got - all_true)[:5]}"


def test_minhash_hot_bucket_guard_keeps_blob_connected(spark):
    """Hot-bucket guard property (the embed_neardup/semdedup invariant, LSH
    instance): a blob of IDENTICAL documents larger than _MH_BUCKET_CAP
    shares every band signature, landing all members in the same 8 buckets.
    All-pairs there would be m²/2 candidates; the guard must instead emit a
    bounded, CONNECTED pair set (downstream clustering still collapses the
    blob to one representative) and leave unrelated docs un-paired."""
    from synth_timeseries_data_spark.queries.llm_pipeline import (
        _MH_BUCKET_CAP,
        _MH_NEIGHBORS,
        _SPARK_D,
        _mh_docagg_sql,
        _mh_sigs_sql,
        _minhash_tail,
        _shingles_raw_cte,
    )

    m = _MH_BUCKET_CAP * 3  # decisively over-cap
    blob_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, blob_text) for i in range(m)]
    # background: distinct docs, no shared shingles with the blob or each other
    rows += [
        (m + i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    df.createOrReplaceTempView("documents_par")
    try:
        sql = (
            _shingles_raw_cte(_SPARK_D)
            + f", docagg AS ({_mh_docagg_sql(_SPARK_D)})"
            + f", sigs AS ({_mh_sigs_sql(_SPARK_D, 'docagg')}),"
            + _minhash_tail(_SPARK_D, "docagg", "sigs")
        )
        pairs = [(r.doc_a, r.doc_b) for r in spark.sql(sql).collect()]

        parent = list(range(m + 20))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        assert len({find(i) for i in range(m)}) == 1, "blob disconnected"
        assert not any(v >= m for p in pairs for v in p), "background paired"
        # fan-out stayed bounded: identical docs give identical chains in
        # every band, so DISTINCT collapses to ~_MH_NEIGHBORS per member
        assert len(pairs) <= m * _MH_NEIGHBORS, len(pairs)
    finally:
        spark.catalog.dropTempView("documents")
        spark.catalog.dropTempView("documents_par")
