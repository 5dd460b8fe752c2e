"""Cluster-scale technique audits: bucketed co-located joins eliminate the
join exchange entirely; salted joins spread hot keys without changing
results. These run on real plans/executions, not documentation."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from synth_timeseries_data_spark.functions.scale import salted_join, write_bucketed
from synth_timeseries_data_spark.sources import load


@pytest.fixture(scope="module")
def bucket_db(spark):
    d = tempfile.mkdtemp(prefix="bucketdemo_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{d}'")
    yield "bucketdemo"
    spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_runs_without_exchange(spark, smoke_sf_dir, bucket_db):
    """Two tables bucketed on the same key joined on that key: the executed
    sort-merge plan must contain ZERO Exchange operators — the bucketed scan
    satisfies the hash-distribution requirement by construction. This is the
    write-once/join-many shape that removes the dominant shuffle at 100 TB."""
    ev = load(spark, smoke_sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.max("value").alias("max_value")
    )
    first_type = ev.groupBy("user_id").agg(F.min("event_type").alias("first_type"))
    write_bucketed(per_user, f"{bucket_db}.user_stats", "user_id", n_buckets=8)
    write_bucketed(first_type, f"{bucket_db}.user_types", "user_id", n_buckets=8)

    joined = spark.sql(
        f"""SELECT /*+ MERGE(a) */ a.user_id, a.n_events, b.first_type
            FROM {bucket_db}.user_stats a
            JOIN {bucket_db}.user_types b ON a.user_id = b.user_id"""
    )
    n = joined.count()  # force execution so the adaptive plan is final
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert n == per_user.count()


def test_bucketed_aggregation_reuses_bucketing(spark, smoke_sf_dir, bucket_db):
    """A groupBy on the bucket key over a bucketed table must not shuffle."""
    ev = load(spark, smoke_sf_dir, "events")
    write_bucketed(
        ev.select("user_id", "value"), f"{bucket_db}.ev_b", "user_id", n_buckets=8
    )
    agg = spark.table(f"{bucket_db}.ev_b").groupBy("user_id").agg(
        F.count("*").alias("n")
    )
    agg.count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_composite_key_bucketed_self_join_runs_without_exchange(
    spark, smoke_sf_dir, bucket_db
):
    """A table bucketed on a composite key (the LSH index shape:
    (band, sig)) self-joined on that key must carry ZERO Exchange — the
    bucketed_neardup_demo re-query contract."""
    ev = load(spark, smoke_sf_dir, "events")
    sigs = ev.select(
        (F.col("event_id") % 4).cast("int").alias("band"),
        F.substring(F.md5(F.col("event_type")), 1, 4).alias("sig"),
        "event_id",
    )
    write_bucketed(
        sigs.repartition(8, "band", "sig"),
        f"{bucket_db}.sigs_b",
        ("band", "sig"),
        n_buckets=8,
    )
    t = spark.table(f"{bucket_db}.sigs_b")
    # MERGE hint: the fixture is broadcast-small, but the contract under
    # test is the sort-merge shape a corpus-sized index takes
    pairs = t.alias("a").hint("merge").join(
        t.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a.event_id") < F.col("b.event_id")),
    )
    pairs.count()
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Exchange" not in plan, plan[:2000]


def test_neardup_index_api_matches_registry(spark, smoke_sf_dir, bucket_db):
    """The persisted-index API (functions/neardup_index.py) must return
    the SAME pair sets as the session-form registry queries, with the
    index scans bucketed. Restores the two planner confs the API sets so
    plan-pinned tests elsewhere in the suite see the default posture."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        INDEX_PLANNER_CONFS,
        build_embed_index,
        build_minhash_index,
        embed_pairs_indexed,
        index_posture,
        minhash_pairs_indexed,
    )
    from synth_timeseries_data_spark.queries.llm_pipeline import (
        embed_neardup,
        minhash_dedup,
    )

    saved = {c: spark.conf.get(c) for c in INDEX_PLANNER_CONFS}
    with index_posture(spark):
        docagg_t, mem_t = build_minhash_index(
            spark, smoke_sf_dir, prefix=f"{bucket_db}.mh", n_buckets=8
        )
        got = minhash_pairs_indexed(spark, docagg_t, mem_t)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan[:2000]
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, minhash_dedup(spark, smoke_sf_dir).collect())
        )

        members_t, bits = build_embed_index(
            spark, smoke_sf_dir, prefix=f"{bucket_db}.nd", n_buckets=8
        )
        got = embed_pairs_indexed(spark, members_t, bits)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, embed_neardup(spark, smoke_sf_dir).collect())
        )
    # the context manager restored the session's default posture
    assert {c: spark.conf.get(c) for c in INDEX_PLANNER_CONFS} == saved


def test_ivf_serving_index_prunes_partitions_and_matches(
    spark, smoke_sf_dir, bucket_db
):
    """The persisted IVF cells index must answer top-10 bit-equal to the
    session-form vec_topk_ivf, with the probe reading ONLY the probed
    cells' partitions (static partition filter on the scan)."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        build_ivf_index,
        ivf_topk_indexed,
    )
    from synth_timeseries_data_spark.queries.llm_pipeline import vec_topk_ivf

    table = build_ivf_index(spark, smoke_sf_dir, prefix=f"{bucket_db}.ivf")
    got_df = ivf_topk_indexed(spark, smoke_sf_dir, table)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and " IN (" in plan, plan[:2000]
    got = [tuple(r) for r in got_df.collect()]
    want = [tuple(r) for r in vec_topk_ivf(spark, smoke_sf_dir).collect()]
    assert got == want


def test_lsh_serving_index_prunes_partitions_and_matches(
    spark, smoke_sf_dir, bucket_db
):
    """The persisted LSH cells index must answer top-10 bit-equal to the
    session-form vec_topk_lsh, with the probe reading ONLY the query
    signature's partition (static partition filter on the scan)."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        build_lsh_index,
        lsh_topk_indexed,
    )
    from synth_timeseries_data_spark.queries.llm_pipeline import vec_topk_lsh

    table = build_lsh_index(spark, smoke_sf_dir, prefix=f"{bucket_db}.lshq")
    got_df = lsh_topk_indexed(spark, smoke_sf_dir, table)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "sig" in plan, plan[:2000]
    got = [tuple(r) for r in got_df.collect()]
    want = [tuple(r) for r in vec_topk_lsh(spark, smoke_sf_dir).collect()]
    assert got == want


def test_pq_serving_index_scans_compressed_codes_and_matches(
    spark, smoke_sf_dir, bucket_db
):
    """The persisted PQ code index must answer top-10 bit-equal to the
    session-form vec_topk_pq, with the ADC pass running as in-scan array
    lookups over the packed code table — no join or per-vector
    aggregation, straight into a top-k."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        build_pq_index,
        index_posture,
        pq_topk_indexed,
    )
    from synth_timeseries_data_spark.queries.llm_pipeline import vec_topk_pq

    with index_posture(spark):
        table = build_pq_index(
            spark, smoke_sf_dir, prefix=f"{bucket_db}.pq", n_buckets=8
        )
        got_df = pq_topk_indexed(spark, smoke_sf_dir, table)
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        # in-scan ADC lookups (the folded lambda over the packed codes)
        # feeding a top-k — no qd join, no per-vector HashAggregate
        assert "element_at(" in plan and "lambdafunction" in plan, plan[:2000]
        assert "TakeOrderedAndProject" in plan, plan[:2000]
        got = [tuple(r) for r in got_df.collect()]
    want = [tuple(r) for r in vec_topk_pq(spark, smoke_sf_dir).collect()]
    assert got == want


def test_ann_index_append_matches_full_rebuild(spark, smoke_sf_dir, bucket_db):
    """Incremental maintenance: an index built on a base split and grown
    with append_*_index over the delta must answer probes bit-equal to
    the registry query over the FULL corpus — signatures/cells/codes are
    assigned against the frozen grid, so append is delta-proportional
    and never a rebuild."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        append_ivf_index,
        append_lsh_index,
        append_pq_index,
        build_ivf_index,
        build_lsh_index,
        build_pq_index,
        index_posture,
        ivf_topk_indexed,
        lsh_topk_indexed,
        pq_topk_indexed,
    )
    from synth_timeseries_data_spark.queries.llm_pipeline import (
        vec_topk_ivf,
        vec_topk_lsh,
        vec_topk_pq,
    )

    # Delta = every 5th vector past the query/anchor ids; base = the rest.
    delta = "vec_id > 16 AND vec_id % 5 = 4"
    base = f"NOT ({delta})"

    t = build_lsh_index(spark, smoke_sf_dir, prefix=f"{bucket_db}.alsh", where=base)
    append_lsh_index(spark, smoke_sf_dir, t, where=delta)
    got = [tuple(r) for r in lsh_topk_indexed(spark, smoke_sf_dir, t).collect()]
    assert got == [
        tuple(r) for r in vec_topk_lsh(spark, smoke_sf_dir).collect()
    ]

    t = build_ivf_index(spark, smoke_sf_dir, prefix=f"{bucket_db}.aivf", where=base)
    append_ivf_index(spark, smoke_sf_dir, t, where=delta)
    got = [tuple(r) for r in ivf_topk_indexed(spark, smoke_sf_dir, t).collect()]
    assert got == [
        tuple(r) for r in vec_topk_ivf(spark, smoke_sf_dir).collect()
    ]

    with index_posture(spark):
        t = build_pq_index(
            spark, smoke_sf_dir, prefix=f"{bucket_db}.apq", n_buckets=8,
            where=base,
        )
        append_pq_index(
            spark, smoke_sf_dir, t, where=delta, n_buckets=8
        )
        got = [tuple(r) for r in pq_topk_indexed(spark, smoke_sf_dir, t).collect()]
        # where may reference ANY embeddings column, not just vec_id
        # (the code-assignment filter runs over the exploded relation,
        # which carries a precomputed selection marker for this)
        t2 = build_pq_index(
            spark, smoke_sf_dir, prefix=f"{bucket_db}.apq2", n_buckets=8,
            where="label IS NOT NULL OR vec_id >= 0",
        )
        full = [tuple(r) for r in pq_topk_indexed(spark, smoke_sf_dir, t2).collect()]
    want = [tuple(r) for r in vec_topk_pq(spark, smoke_sf_dir).collect()]
    assert got == want
    assert full == want


def test_minhash_delta_pairs_union_equals_full_dedup(
    spark, smoke_sf_dir, bucket_db
):
    """With the MinHash index built on a base split, (pairs among indexed
    docs) ∪ (minhash_delta_pairs over the delta) must equal
    minhash_dedup over the FULL corpus — the read-only ingest-dedup
    invariant (gate scales never engage the dense guard, so the union is
    exact)."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        build_minhash_index,
        index_posture,
        minhash_delta_pairs,
        minhash_pairs_indexed,
    )
    from synth_timeseries_data_spark.queries.llm_pipeline import minhash_dedup

    delta = "doc_id % 7 = 3"
    with index_posture(spark):
        docagg_t, mem_t = build_minhash_index(
            spark, smoke_sf_dir, prefix=f"{bucket_db}.dmh", n_buckets=8,
            where=f"NOT ({delta})",
        )
        base_pairs = [
            tuple(r)
            for r in minhash_pairs_indexed(spark, docagg_t, mem_t).collect()
        ]
        delta_df = minhash_delta_pairs(spark, smoke_sf_dir, docagg_t, mem_t, delta)
        # The delta corpus pass runs ONCE (at localCheckpoint) — the
        # probe plan itself must not re-scan documents (as a CTE the
        # pass was inlined 5x).
        plan = delta_df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("documents.parquet") == 0, plan[:2000]
        delta_pairs = [tuple(r) for r in delta_df.collect()]
    full = [tuple(r) for r in minhash_dedup(spark, smoke_sf_dir).collect()]
    assert delta_pairs, "delta must contribute pairs for the test to bite"
    assert sorted(base_pairs + delta_pairs) == sorted(full)


def test_lsh_ingest_stream_builds_index_matching_batch(
    spark, smoke_sf_dir, bucket_db, tmp_path
):
    """Two 'arriving' embeddings files streamed through lsh_ingest_stream
    (one micro-batch each) must leave a cells table whose probe answers
    bit-equal to the session-form vec_topk_lsh over the full corpus —
    the continuous-ingest form of index maintenance."""
    import os

    from synth_timeseries_data_spark.functions.neardup_index import (
        lsh_ingest_stream,
        lsh_topk_indexed,
    )
    from synth_timeseries_data_spark.queries.llm_pipeline import vec_topk_lsh

    src = spark.read.parquet(os.path.join(smoke_sf_dir, "embeddings.parquet"))
    ingest = str(tmp_path / "ingest")
    delta = "vec_id > 16 AND vec_id % 5 = 4"
    src.where(f"NOT ({delta})").coalesce(1).write.mode("append").parquet(ingest)
    src.where(delta).coalesce(1).write.mode("append").parquet(ingest)

    table = f"{bucket_db}.slsh_cells"
    q = lsh_ingest_stream(spark, ingest, table, str(tmp_path / "ckpt"))
    assert q.awaitTermination(180)
    n = spark.sql(f"SELECT COUNT(DISTINCT vec_id) AS c FROM {table}").first()["c"]
    assert n == src.count()
    got = [tuple(r) for r in lsh_topk_indexed(spark, smoke_sf_dir, table).collect()]
    want = [tuple(r) for r in vec_topk_lsh(spark, smoke_sf_dir).collect()]
    assert got == want


def test_salted_join_matches_plain_join_under_skew(spark):
    """90%-hot-key fact salted-joined to its dim must equal the plain join,
    and the physical join must key on the salt (spreading the hot key)."""
    fact = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("long").alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("label_"), F.col("id")).alias("label")
    )
    plain = fact.join(dim, "k").groupBy("k", "label").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(fact, dim, "k").groupBy("k", "label").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # the join really keys on (k, __salt)


def test_funnel_over_bucketed_events_zero_exchange(spark, smoke_sf_dir, bucket_db):
    """The flagship funnel shape on bucketed storage: events written
    bucketBy(user_id) once, then the per-user stage aggregation runs with
    ZERO exchange before the final tiny rollup — the storage form that
    turns funnel's one fact shuffle into a one-time write cost at 100 TB.
    Result must equal the plain-table funnel bit-for-bit."""
    from synth_timeseries_data_spark.queries import all_queries

    ev = load(spark, smoke_sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    write_bucketed(ev, f"{bucket_db}.ev_bucketed", "user_id", n_buckets=8)

    peru_sql = """
        SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts div 1000 END) AS t1,
          array_sort(collect_list(
            CASE WHEN event_type = 'click' THEN ts div 1000 END)) AS clicks,
          array_sort(collect_list(
            CASE WHEN event_type = 'purchase' THEN ts div 1000 END)) AS purch
        FROM {src} GROUP BY user_id
    """
    plan = (
        spark.sql(peru_sql.format(src=f"{bucket_db}.ev_bucketed"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:1500]

    # end-to-end equality vs the registered funnel on the plain table
    tail = """
        , stages AS (
          SELECT user_id, t1,
            try_element_at(filter(clicks, x -> x > t1), 1) AS t2,
            try_element_at(filter(purch, x -> x > t2), 1) AS t3
          FROM peru
        )
        SELECT COUNT(*) AS n_users_seen, COUNT(t1) AS n_viewed,
               COUNT(t2) AS n_clicked_after_view,
               COUNT(t3) AS n_purchased_after_click,
               CAST(COUNT(t3) AS DOUBLE) / NULLIF(COUNT(t1), 0)
                 AS view_to_purchase_rate
        FROM stages
    """
    bucketed = spark.sql(
        "WITH peru AS ("
        + peru_sql.format(src=f"{bucket_db}.ev_bucketed")
        + ")"
        + tail
    ).collect()
    plain = all_queries()["funnel"].build(spark, smoke_sf_dir).collect()
    assert bucketed == plain


def test_novelty_delta_equals_full_novelty_on_delta_docs(
    spark, smoke_sf_dir, bucket_db
):
    """With the run index built on the already-ingested prefix (all docs
    NOT in the delta), novelty_delta over the arriving batch must equal
    the registry's ngram_novelty restricted to the delta docs — the
    read-only incremental-novelty invariant. The index side of the probe
    join must be the bucketed scan (no exchange above it)."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        build_runs_index,
        index_posture,
        novelty_delta,
    )
    from synth_timeseries_data_spark.queries import all_queries

    delta = "doc_id % 5 = 2"
    with index_posture(spark):
        runs_t = build_runs_index(
            spark, smoke_sf_dir, prefix=f"{bucket_db}.nvx", n_buckets=8,
            where=f"NOT ({delta})",
        )
        got = sorted(
            tuple(r)
            for r in novelty_delta(spark, smoke_sf_dir, runs_t, delta).collect()
        )
    full = all_queries()["ngram_novelty"].build(spark, smoke_sf_dir)
    want = sorted(
        tuple(r) for r in full.where(delta).collect()
    )
    assert got and got == want
    # the delta must contain both novel-heavy and stale docs to bite
    novelty = {r[0]: r[3] for r in got}
    assert min(novelty.values()) < 1000000


def test_novelty_ingest_stream_replays_to_full_novelty(
    spark, smoke_sf_dir, bucket_db, tmp_path
):
    """Two 'arriving' document files (doc_id-ordered, the append-only
    crawl contract) streamed through novelty_ingest_stream must leave a
    novelty feed that row-for-row equals the registry's ngram_novelty
    over the full corpus, and a run index equal to a batch rebuild."""
    import os

    from synth_timeseries_data_spark.functions.neardup_index import (
        index_posture,
        novelty_ingest_stream,
    )
    from synth_timeseries_data_spark.queries import all_queries
    from synth_timeseries_data_spark.sources import load

    docs = load(spark, smoke_sf_dir, "documents")
    cut = docs.selectExpr("percentile_approx(doc_id, 0.5) AS m").first()["m"]
    ingest = str(tmp_path / "docs_ingest")
    docs.where(f"doc_id <= {cut}").coalesce(1).write.mode("append").parquet(ingest)
    docs.where(f"doc_id > {cut}").coalesce(1).write.mode("append").parquet(ingest)

    table = f"{bucket_db}.snv_runs"
    feed = str(tmp_path / "novelty_feed")
    with index_posture(spark):
        q = novelty_ingest_stream(
            spark, ingest, table, feed, str(tmp_path / "nv_ckpt"), n_buckets=8
        )
        assert q.awaitTermination(180)
        got = sorted(tuple(r) for r in spark.read.parquet(feed).collect())
    want = sorted(
        tuple(r)
        for r in all_queries()["ngram_novelty"].build(spark, smoke_sf_dir).collect()
    )
    assert got == want
    # the index holds every distinct run exactly once
    n_runs = spark.sql(f"SELECT COUNT(*) AS c, COUNT(DISTINCT h) AS d FROM {table}").first()
    assert n_runs["c"] == n_runs["d"] > 0


def test_winnow_candidates_match_bruteforce_probe(
    spark, smoke_sf_dir, bucket_db
):
    """With the fingerprint index built on the already-ingested prefix,
    winnow_candidates over the arriving batch must equal the brute-force
    pair count computed from the registry winnowing relation (distinct
    shared fingerprints, stop-cap applied, min_shared threshold) — the
    MOSS detection invariant. The index side of the probe join must be
    the bucketed scan."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        WINNOW_STOP_CAP,
        build_winnow_index,
        index_posture,
        winnow_candidates,
    )
    from synth_timeseries_data_spark.queries import all_queries

    delta = "doc_id % 5 = 3"
    with index_posture(spark):
        fp_t = build_winnow_index(
            spark, smoke_sf_dir, prefix=f"{bucket_db}.wnx", n_buckets=8,
            where=f"NOT ({delta})",
        )
        got = sorted(
            tuple(r)
            for r in winnow_candidates(
                spark, smoke_sf_dir, fp_t, delta, min_shared=2
            ).collect()
        )
    # brute force from the registry relation
    rows = all_queries()["winnowing"].build(spark, smoke_sf_dir).collect()
    probe: dict[int, set] = {}
    index: dict[int, set] = {}
    carriers: dict[int, set] = {}
    for r in rows:
        side = probe if r.doc_id % 5 == 3 else index
        side.setdefault(r.doc_id, set()).add(r.fp)
    for d, fps in index.items():
        for f in fps:
            carriers.setdefault(f, set()).add(d)
    hot = {f for f, ds in carriers.items() if len(ds) > WINNOW_STOP_CAP}
    want = []
    for pd_, pf in probe.items():
        shared: dict[int, int] = {}
        for f in pf - hot:
            for ix in carriers.get(f, ()):
                if ix != pd_:
                    shared[ix] = shared.get(ix, 0) + 1
        want.extend(
            (pd_, ix, n) for ix, n in shared.items() if n >= 2
        )
    assert got == sorted(want)
    assert got  # the small-vocab fixture must actually produce candidates


def test_winnow_ingest_stream_matches_indexed_probe(
    spark, smoke_sf_dir, bucket_db, tmp_path
):
    """Two 'arriving' document files streamed through winnow_ingest_stream
    must leave a candidate feed equal to the brute-force index-facing
    probe (batch 1 sees an empty index; batch 2 is matched against batch
    1 under the stop cap), and a fingerprint table equal to a batch
    rebuild of the whole corpus."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        WINNOW_STOP_CAP,
        index_posture,
        winnow_ingest_stream,
    )
    from synth_timeseries_data_spark.queries import all_queries
    from synth_timeseries_data_spark.sources import load

    docs = load(spark, smoke_sf_dir, "documents")
    cut = docs.selectExpr("percentile_approx(doc_id, 0.5) AS m").first()["m"]
    ingest = str(tmp_path / "docs_ingest_wn")
    docs.where(f"doc_id <= {cut}").coalesce(1).write.mode("append").parquet(ingest)
    docs.where(f"doc_id > {cut}").coalesce(1).write.mode("append").parquet(ingest)

    table = f"{bucket_db}.swn_fp"
    feed = str(tmp_path / "wn_feed")
    with index_posture(spark):
        q = winnow_ingest_stream(
            spark, ingest, table, feed, str(tmp_path / "wn_ckpt"), n_buckets=8
        )
        assert q.awaitTermination(180)
        got = sorted(tuple(r) for r in spark.read.parquet(feed).collect())
        idx_rows = spark.sql(
            f"SELECT doc_id, fp, pos FROM {table}"
        ).collect()

    fps = all_queries()["winnowing"].build(spark, smoke_sf_dir).collect()
    # index table == batch rebuild (every doc's fingerprints, exactly once)
    assert sorted((r.doc_id, r.fp, r.pos) for r in idx_rows) == sorted(
        (r.doc_id, r.fp, r.pos) for r in fps
    )
    # feed == brute-force index-facing probe for batch 2 against batch 1
    b1: dict[int, set] = {}
    b2: dict[int, set] = {}
    for r in fps:
        (b1 if r.doc_id <= cut else b2).setdefault(r.doc_id, set()).add(r.fp)
    carriers: dict[int, set] = {}
    for d, f_set in b1.items():
        for f in f_set:
            carriers.setdefault(f, set()).add(d)
    hot = {f for f, ds in carriers.items() if len(ds) > WINNOW_STOP_CAP}
    want = []
    for pd_, pf in b2.items():
        shared: dict[int, int] = {}
        for f in pf - hot:
            for ix in carriers.get(f, ()):
                shared[ix] = shared.get(ix, 0) + 1
        want.extend((pd_, ix, n) for ix, n in shared.items() if n >= 2)
    assert got == sorted(want)
    assert got  # the small-vocab fixture must produce cross-batch pairs


def test_winnow_ingest_stream_checkpoint_restart(
    spark, smoke_sf_dir, bucket_db, tmp_path
):
    """Durability: stream batch 1 to termination, STOP, then deliver batch
    2 and restart on the same checkpoint — the final feed and index must
    equal the single-run replay (batch 1 is not reprocessed; batch 2 is
    matched against batch 1's fingerprints)."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        index_posture,
        winnow_ingest_stream,
    )
    from synth_timeseries_data_spark.queries import all_queries
    from synth_timeseries_data_spark.sources import load

    docs = load(spark, smoke_sf_dir, "documents")
    cut = docs.selectExpr("percentile_approx(doc_id, 0.5) AS m").first()["m"]
    ingest = str(tmp_path / "docs_ingest_wr")
    ckpt = str(tmp_path / "wr_ckpt")
    feed = str(tmp_path / "wr_feed")
    table = f"{bucket_db}.swr_fp"

    docs.where(f"doc_id <= {cut}").coalesce(1).write.mode("append").parquet(ingest)
    with index_posture(spark):
        q = winnow_ingest_stream(spark, ingest, table, feed, ckpt, n_buckets=8)
        assert q.awaitTermination(180)
        n_after_b1 = spark.sql(f"SELECT COUNT(*) AS c FROM {table}").first()["c"]
        docs.where(f"doc_id > {cut}").coalesce(1).write.mode("append").parquet(ingest)
        q2 = winnow_ingest_stream(spark, ingest, table, feed, ckpt, n_buckets=8)
        assert q2.awaitTermination(180)
        # the mid-run count above cached this session's file listing for the
        # table, and micro-batch appends run on a CLONED session whose cache
        # invalidation does not reach the parent — the standard
        # external-writer rule applies: REFRESH before trusting a re-read
        # (documented on winnow_ingest_stream)
        spark.sql(f"REFRESH TABLE {table}")
        idx_rows = spark.sql(f"SELECT doc_id, fp, pos FROM {table}").collect()

    fps = all_queries()["winnowing"].build(spark, smoke_sf_dir).collect()
    assert n_after_b1 == sum(1 for r in fps if r.doc_id <= cut)
    # no batch-1 duplication, full batch-2 append
    assert sorted((r.doc_id, r.fp, r.pos) for r in idx_rows) == sorted(
        (r.doc_id, r.fp, r.pos) for r in fps
    )
    # the feed holds exactly the cross-batch pairs (probe side = batch 2)
    pairs = spark.read.parquet(feed).collect()
    assert pairs and all(p.probe_doc > cut and p.index_doc <= cut for p in pairs)


def test_trained_ivf_serving_index_matches_session(spark, smoke_sf_dir, bucket_db):
    """The persisted trained-quantizer IVF index (cells + quantizer
    tables) must answer top-10 bit-equal to the session-form
    vec_topk_ivf_trained, still with partition-pruned probes."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        build_ivf_index,
        ivf_topk_indexed,
    )
    from synth_timeseries_data_spark.queries.corpus_mining import (
        vec_topk_ivf_trained,
    )

    table = build_ivf_index(
        spark, smoke_sf_dir, prefix=f"{bucket_db}.tivf", quantizer="trained"
    )
    got_df = ivf_topk_indexed(spark, smoke_sf_dir, table)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and " IN (" in plan, plan[:2000]
    got = [tuple(r) for r in got_df.collect()]
    want = [tuple(r) for r in vec_topk_ivf_trained(spark, smoke_sf_dir).collect()]
    assert got == want


def test_ivf_lcg_rebuild_drops_stale_trained_quantizer(
    spark, smoke_sf_dir, bucket_db
):
    """Rebuilding at a prefix that previously carried a trained build must
    not leave the quantizer table behind — probes would silently assign
    against the old trained centroids while the cells are LCG-partitioned
    (the review-caught silent-wrong-results case)."""
    from synth_timeseries_data_spark.functions.neardup_index import (
        build_ivf_index,
        ivf_topk_indexed,
    )
    from synth_timeseries_data_spark.queries.llm_pipeline import vec_topk_ivf

    prefix = f"{bucket_db}.reivf"
    build_ivf_index(spark, smoke_sf_dir, prefix=prefix, quantizer="trained")
    assert spark.catalog.tableExists(f"{prefix}_quantizer")
    table = build_ivf_index(spark, smoke_sf_dir, prefix=prefix)  # lcg rebuild
    assert not spark.catalog.tableExists(f"{prefix}_quantizer")
    got = [tuple(r) for r in ivf_topk_indexed(spark, smoke_sf_dir, table).collect()]
    want = [tuple(r) for r in vec_topk_ivf(spark, smoke_sf_dir).collect()]
    assert got == want
