"""Semantic checks for the composed EP3 discovery benchmark beyond the
dual-engine hash gate (which pins Spark == DuckDB but not the metric
algebra itself): capacity-matching and confusion identities that hold by
construction, so a regression in any stage of the composition (gt dedup,
screener ranking, cell expansion, scoring joins) breaks an analytic
invariant, not just the cross-engine hash."""

from __future__ import annotations

import duckdb
import pytest

from synth_timeseries_data_spark.queries import all_queries


@pytest.fixture(scope="module")
def bench_df(oracle_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{oracle_sf_dir}/events.parquet')"
    )
    q = all_queries()["discovery_benchmark"]
    df = con.execute(q.oracle).df()
    con.close()
    return df


def test_one_row_per_dsl_config(bench_df):
    from synth_timeseries_data_spark.dsl.registry import EQUATION_ROWS

    configs = {(f, v, l) for f, v, l, _, _ in EQUATION_ROWS}
    got = set(
        zip(bench_df.family, bench_df.n_vars, bench_df.max_lag)
    )
    assert got == configs


def test_confusion_partitions_the_tensor(bench_df):
    # tp+fp+fn+tn == all cells of the (V, V, L+1) tensor minus the V
    # excluded self-at-lag-0 cells.
    for r in bench_df.itertuples():
        cells = r.n_vars * r.n_vars * (r.max_lag + 1) - r.n_vars
        assert r.tp + r.fp + r.fn + r.tn == cells, r


def test_capacity_matched_screener(bench_df):
    # The stub predictor marks exactly m = |gt| cells, so predicted count
    # (tp+fp) equals ground-truth count (tp+fn) for every config.
    for r in bench_df.itertuples():
        assert r.tp + r.fp == r.tp + r.fn, r
        assert r.tp + r.fn > 0, r  # every DSL config has edges


def test_shd_identities(bench_df):
    # M4 identity: SHD-XOR == fp + fn (metrics_helper.py:37-43 property).
    # M5 bound: reversal-aware SHD is <= SHD-XOR (each reversal replaces a
    # fp+fn pair, cost 2 -> 1) and >= half of it.
    for r in bench_df.itertuples():
        assert r.shd == r.fp + r.fn, r
        assert r.shd_rev <= r.shd, r
        assert 2 * r.shd_rev >= r.shd, r


def test_reference_zero_guards(bench_df):
    # Empty denominators must score 0.0 like metrics_helper.py:20-35, and
    # every rate is a valid proportion.
    assert ((bench_df.tpr >= 0) & (bench_df.tpr <= 1)).all()
    assert ((bench_df.fdr >= 0) & (bench_df.fdr <= 1)).all()
    assert ((bench_df.f1 >= 0) & (bench_df.f1 <= 1)).all()


def test_deterministic_rerun(bench_df, oracle_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{oracle_sf_dir}/events.parquet')"
    )
    again = con.execute(all_queries()["discovery_benchmark"].oracle).df()
    con.close()
    assert bench_df.equals(again)
