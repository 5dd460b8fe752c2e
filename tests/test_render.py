"""Optional G19 figure rendering (functions/render.py): the data-prep
helpers are pure pyarrow/numpy and always tested; the matplotlib draw
step is tested where matplotlib is importable and must fail with a clear
actionable error where it is not (reference figures: c1.py:391-411,
c2.py:332-341, d1.py:327-337)."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from synth_timeseries_data_spark.functions import render as R


@pytest.fixture(scope="module")
def tiny_bundle():
    """A hand-built frame=*/ bundle with known values (no Spark)."""
    root = tempfile.mkdtemp(prefix="render_bundle_")
    deco = pa.table(
        {
            "user_id": [2, 2, 2, 1, 1, 1, 3, 3],
            "event_id": [1, 2, 3, 1, 2, 3, 1, 2],
            "x_day": [0.0, 1.0, 2.0, 0.0, 2.0, 1.0, 0.5, 1.5],
            "value": [1.0, 2.0, 3.0, 5.0, 7.0, 6.0, 0.0, 1.0],
            "trend": [1.0, 2.0, 3.0, 5.0, 7.0, 6.0, 0.25, 0.75],
        }
    )
    hist = pa.table(
        {"gap_min_bucket": [5, 1, 2], "n": [10, 60, 30]}
    )
    miss = pa.table(
        {
            "hour_bucket": [0, 0, 1],
            "event_type": ["view", "click", "view"],
            "n_rows": [10, 5, 8],
            "n_missing": [2, 1, 4],
            "missing_rate": [0.2, 0.2, 0.5],
        }
    )
    for name, tab in (
        ("decomposition", deco),
        ("sampling_hist", hist),
        ("missing_pattern", miss),
    ):
        d = os.path.join(root, f"frame={name}")
        os.makedirs(d)
        pq.write_table(tab, os.path.join(d, "part-0.parquet"))
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_prep_decomposition_orders_and_limits(tiny_bundle):
    series = R.prep_decomposition(tiny_bundle, max_series=2)
    # first two user_ids in sorted order, each x-sorted
    assert [s[0] for s in series] == [1, 2]
    u1 = series[0]
    assert u1[1].tolist() == [0.0, 1.0, 2.0]          # x sorted
    assert u1[2].tolist() == [5.0, 6.0, 7.0]          # values follow x
    assert np.allclose(u1[3], u1[2])                  # trend carried through


def test_prep_sampling_hist_density_sums_to_one(tiny_bundle):
    b, density = R.prep_sampling_hist(tiny_bundle)
    assert b.tolist() == [1.0, 2.0, 5.0]
    assert density.tolist() == [0.6, 0.3, 0.1]        # n/total, 1-min bins
    assert pytest.approx(density.sum()) == 1.0


def test_prep_missing_pattern_grid(tiny_bundle):
    hours, types, grid = R.prep_missing_pattern(tiny_bundle)
    assert hours.tolist() == [0, 1]
    assert types == ["click", "view"]
    assert grid[types.index("view"), 0] == 0.2
    assert grid[types.index("view"), 1] == 0.5
    assert grid[types.index("click"), 0] == 0.2
    assert np.isnan(grid[types.index("click"), 1])    # absent cell stays NaN


def test_render_without_matplotlib_raises_actionable(tiny_bundle):
    if R._have_matplotlib():
        pytest.skip("matplotlib installed - error path not reachable")
    out = tempfile.mkdtemp(prefix="render_out_")
    try:
        with pytest.raises(RuntimeError, match="matplotlib"):
            R.render_plot_bundle(tiny_bundle, out)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_render_writes_three_pngs(tiny_bundle):
    pytest.importorskip("matplotlib")
    out = tempfile.mkdtemp(prefix="render_out_")
    try:
        written = R.render_plot_bundle(tiny_bundle, out)
        assert len(written) == 3
        for path in written:
            assert os.path.getsize(path) > 1000      # a real PNG, not a stub
            with open(path, "rb") as fh:
                assert fh.read(8) == b"\x89PNG\r\n\x1a\n"
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_cli_render_flag(spark, smoke_sf_dir, capsys):
    """--render either draws PNGs (matplotlib present) or exits 2 with a
    clear message (absent) — never a traceback, never a silent no-op."""
    from synth_timeseries_data_spark.__main__ import main

    out = tempfile.mkdtemp(prefix="cli_pbr_")
    try:
        rc = main(["plot-bundle", "--sf-dir", smoke_sf_dir,
                   "--out", out, "--render"])
        captured = capsys.readouterr()
        if R._have_matplotlib():
            assert rc == 0
            figs = os.path.join(out, "figures")
            assert sorted(os.listdir(figs)) == [
                "decomposition.png", "missing_pattern.png",
                "sampling_hist.png",
            ]
            assert "rendered" in captured.out
        else:
            assert rc == 2
            assert "matplotlib" in captured.err
            assert not os.path.isdir(os.path.join(out, "figures"))
    finally:
        shutil.rmtree(out, ignore_errors=True)
