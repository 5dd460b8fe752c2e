"""Semantic properties of the dataset-assembly operators beyond the oracle
gate: split mass balance, per-stratum sample rates, and planted-leak
detection. These pin behavior the value-hash alone wouldn't explain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from synth_timeseries_data_spark.queries import all_queries


def test_hash_split_fractions_and_determinism(spark, oracle_sf_dir):
    q = all_queries()["hash_split"]
    rows = q.build(spark, oracle_sf_dir).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    total = sum(by_split.values())
    assert total == 500  # every doc assigned exactly once
    # md5 buckets are uniform: 80/10/10 within binomial slack at n=500
    assert abs(by_split["train"] / total - 0.80) < 0.06
    assert abs(by_split["valid"] / total - 0.10) < 0.05
    assert abs(by_split["test"] / total - 0.10) < 0.05
    # determinism: a second run is identical row-for-row
    again = q.build(spark, oracle_sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_stratified_sample_respects_rates(spark, oracle_sf_dir):
    from synth_timeseries_data_spark.sources import load

    sampled = all_queries()["stratified_sample"].build(spark, oracle_sf_dir)
    got = {r.lang: r.n for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {
        r.lang: r.n
        for r in load(spark, oracle_sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rates = {"en": 0.40, "zh": 0.80, "es": 0.80, "de": 1.00, "fr": 1.00}
    for lang, rate in rates.items():
        if rate == 1.0:
            assert got[lang] == base[lang], lang  # keep-all strata lose nothing
        else:
            # hash-uniform keep: observed rate within binomial slack
            assert abs(got[lang] / base[lang] - rate) < 0.15, lang


def test_contamination_detects_planted_leak(spark):
    """A doc duplicated into ids that hash to train and test splits MUST be
    reported; distinct-prefix docs must not be."""
    from synth_timeseries_data_spark.queries.llm_pipeline import (
        _SPARK_D,
        _contam_spark_sql,
        _hex2int,
    )

    # find ids in each split by evaluating the same bucket expression
    strcast = "STRING"
    bucket = _hex2int(
        _SPARK_D, f"SUBSTR(md5(CONCAT('split|', CAST(id AS {strcast}))), 1, 15)"
    )
    buckets = {
        r.id: r.b
        for r in spark.sql(
            f"SELECT id, CAST({bucket} % 100 AS INT) AS b "
            "FROM (SELECT explode(sequence(0, 200)) AS id)"
        ).collect()
    }
    train_id = next(i for i, b in buckets.items() if b < 80)
    test_id = next(i for i, b in buckets.items() if b >= 90)
    clean_id = next(i for i, b in buckets.items() if b < 80 and i != train_id)

    leak_text = "alpha beta gamma delta epsilon"
    docs = [
        (train_id, leak_text),
        (test_id, leak_text + " zeta"),  # same 3-word prefix → leak
        (clean_id, "one two three four"),
    ]
    values = ", ".join(f"({i}, '{t}')" for i, t in docs)
    spark.sql(
        f"SELECT * FROM (VALUES {values}) AS documents(doc_id, text)"
    ).createOrReplaceTempView("documents")
    try:
        got = {
            (r.test_doc, r.train_doc)
            for r in spark.sql(_contam_spark_sql("documents")).collect()
        }
        assert (test_id, train_id) in got
        assert all(tr != clean_id for _, tr in got)
    finally:
        spark.catalog.dropTempView("documents")
