"""Optional G19 figure rendering for the plot-data bundle.

The reference renders three PNGs per generated run (matplotlib):
decomposition panels with a fitted trend line (``Codes/c1.py:391-411``),
a sampling-interval histogram (``Codes/c2.py:332-341``), and a
missing-pattern heatmap (``Codes/d1.py:327-337``). The engine ships the
DATA behind each figure as the oracle-checked ``plot_frames`` /
``plot-bundle`` surface; this module is the thin, *optional* drawing
client on top — it reads the already-written ``frame=<name>/`` parquet
driver-side (every frame is a bounded summary or a per-point frame read
with column/row pushdown, never a corpus scan) and draws one PNG per
family.

matplotlib is an optional dependency (deliberately not part of the
engine's runtime): the data-prep helpers below are pure
pyarrow/numpy and fully tested everywhere; the draw step raises a
clear ``RuntimeError`` when matplotlib is absent and is tested where it
is importable.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow.dataset as pads


def _have_matplotlib() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except ImportError:
        return False


def _require_matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")  # headless; never require a display
        from matplotlib import pyplot as plt

        return plt
    except ImportError as exc:  # pragma: no cover - exercised without mpl
        raise RuntimeError(
            "rendering requires matplotlib, which is not installed in this "
            "environment; the plot-bundle DATA is already written — install "
            "matplotlib (or point any plotting client at frame=*/ parquet) "
            "to draw figures"
        ) from exc


# ---------------------------------------------------------------------------
# data prep (pure pyarrow/numpy — tested without matplotlib)
# ---------------------------------------------------------------------------


def prep_decomposition(bundle_dir: str, max_series: int = 6):
    """Per-series (x_day, value, trend) arrays for the first ``max_series``
    user_ids. Two pushed-down reads: one single-column scan for the
    series ids, one row-filtered scan for just the chosen series —
    the render client never materializes the full per-point frame."""
    ds = pads.dataset(os.path.join(bundle_dir, "frame=decomposition"))
    ids = ds.to_table(columns=["user_id"]).column("user_id").unique()
    chosen = sorted(ids.to_pylist())[:max_series]
    tab = ds.to_table(
        columns=["user_id", "x_day", "value", "trend"],
        filter=pads.field("user_id").isin(chosen),
    )
    uid = np.asarray(tab.column("user_id"))
    x = np.asarray(tab.column("x_day"), dtype=np.float64)
    val = np.asarray(tab.column("value"), dtype=np.float64)
    tr = np.asarray(tab.column("trend"), dtype=np.float64)
    out = []
    for u in chosen:
        m = uid == u
        order = np.argsort(x[m], kind="stable")
        out.append((u, x[m][order], val[m][order], tr[m][order]))
    return out


def prep_sampling_hist(bundle_dir: str):
    """(bucket_minutes, density) arrays — the reference's density=True
    normalization (c2.py:335): counts / (total * bin_width)."""
    tab = pads.dataset(os.path.join(bundle_dir, "frame=sampling_hist")).to_table()
    b = np.asarray(tab.column("gap_min_bucket"), dtype=np.float64)
    n = np.asarray(tab.column("n"), dtype=np.float64)
    order = np.argsort(b, kind="stable")
    b, n = b[order], n[order]
    total = n.sum()
    density = n / (total * 1.0) if total > 0 else n  # 1-minute bins
    return b, density


def prep_missing_pattern(bundle_dir: str):
    """(hours, event_types, rate_matrix) — missing_rate pivoted to a
    dense [type x hour] grid with NaN for absent cells, the shape
    d1.py:327-337 feeds to imshow."""
    tab = pads.dataset(os.path.join(bundle_dir, "frame=missing_pattern")).to_table()
    hour = np.asarray(tab.column("hour_bucket"), dtype=np.int64)
    etype = np.asarray(tab.column("event_type"))
    rate = np.asarray(tab.column("missing_rate"), dtype=np.float64)
    hours = np.unique(hour)
    types = sorted(set(etype.tolist()))
    grid = np.full((len(types), len(hours)), np.nan)
    hidx = {h: i for i, h in enumerate(hours.tolist())}
    tidx = {t: i for i, t in enumerate(types)}
    for h, t, r in zip(hour.tolist(), etype.tolist(), rate.tolist()):
        grid[tidx[t], hidx[h]] = r
    return hours, types, grid


# ---------------------------------------------------------------------------
# drawing (matplotlib behind the try-import)
# ---------------------------------------------------------------------------


def render_plot_bundle(bundle_dir: str, render_dir: str,
                       max_series: int = 6) -> list[str]:
    """Draw the three reference figures from a written plot bundle.
    Returns the list of PNG paths written. Raises RuntimeError with a
    clear message when matplotlib is not installed."""
    plt = _require_matplotlib()
    os.makedirs(render_dir, exist_ok=True)
    written = []

    # decomposition panels (c1.py:391-411): series + dashed red trend,
    # <=3 columns of subplots
    series = prep_decomposition(bundle_dir, max_series)
    if series:
        n = len(series)
        n_cols = min(3, n)
        n_rows = (n + n_cols - 1) // n_cols
        fig = plt.figure(figsize=(5 * n_cols, 5 * n_rows))
        for i, (u, x, val, tr) in enumerate(series):
            ax = fig.add_subplot(n_rows, n_cols, i + 1)
            ax.plot(x, val, label="Series", alpha=0.7)
            ax.plot(x, tr, "r--", label="Trend")
            ax.set_title(f"series {u} Components")
            ax.legend()
            ax.grid(True)
        fig.tight_layout()
        path = os.path.join(render_dir, "decomposition.png")
        fig.savefig(path)
        plt.close(fig)
        written.append(path)

    # sampling-interval histogram (c2.py:332-341)
    b, density = prep_sampling_hist(bundle_dir)
    fig = plt.figure(figsize=(10, 5))
    ax = fig.add_subplot(1, 1, 1)
    ax.bar(b, density, width=1.0, align="edge")
    ax.set_title("Distribution of Sampling Intervals")
    ax.set_xlabel("Gap (minutes)")
    ax.set_ylabel("Density")
    ax.grid(True)
    path = os.path.join(render_dir, "sampling_hist.png")
    fig.savefig(path)
    plt.close(fig)
    written.append(path)

    # missing-pattern heatmap (d1.py:327-337)
    hours, types, grid = prep_missing_pattern(bundle_dir)
    fig = plt.figure(figsize=(15, 5))
    ax = fig.add_subplot(1, 1, 1)
    im = ax.imshow(grid, aspect="auto", cmap="binary",
                   interpolation="nearest")
    ax.set_title("Missing Data Pattern (dark = higher missing rate)")
    ax.set_xlabel("Hour bucket")
    ax.set_ylabel("Event type")
    ax.set_yticks(range(len(types)), types)
    fig.colorbar(im, label="missing_rate")
    path = os.path.join(render_dir, "missing_pattern.png")
    fig.savefig(path)
    plt.close(fig)
    written.append(path)

    return written
