"""Confounded-twin recurrence kernels — tier-(b) reference fidelity.

Every family with a hidden confounder U composes an existing mechanism
(linear / polynomial / trig dynamics, regular / irregular sampling, MCAR /
block / mixed masks — all bit-exact in kernel.py) with U-injection: one
extra noise slot per timestep, U written first, U terms evaluated from the
registry. The seven generators here replicate each reference script's exact
draw order and term grammar:

- B1C (Codes/b1c.py:95-158): polynomial, regular time, reverse-order eval,
  U enters as coef * U[t]**power (squared per registry).
- B2C (Codes/b2c.py:62-165): B1C dynamics over irregular time with
  Gaussian(+)Laplace mixture noise and nearest-abs lag indices.
- C1C (Codes/c1c.py:130-295): trig + index trend/seasonality, list-order
  eval with direct current-row reads, linear U.
- C2C (Codes/c2c.py:116-310): trig + continuous-time seasonality over
  irregular time. QUIRK: evaluate_term's U branch (c2c.py:179-187) tests
  ``expr == 'U[t]'`` before inspecting '^', so the declared U[t]^2 terms
  evaluate as LINEAR coef*U[t] — the '^' sub-branch is dead code. Replicated.
- D1C (Codes/d1c.py:116-254): linear two-pass scheduling WITH the memo-
  shadowing bug (pass 1 records values under the last SOURCE name,
  d1c.py:160-178), + MCAR on X only; U fully observed.
- D2C (Codes/d2c.py:116-264): B1C-style polynomial irregular + Markov block
  mask on X only; U fully observed.
- D3C (Codes/d3c.py:171-409): C2C-style trig irregular + mixture noise +
  MCAR ∪ block mask. Warmup U draws use include_confounder=True with size 1,
  consuming THREE size-2 arrays per warmup row (d3c.py:188-203,384).
  The C2C linear-U quirk applies (d3c.py:275-283).

All numerics are plain numpy with np.random.seed(seed) — bit-exact against
the reference's seed-42 corpus for gaussian/mixture noise (Student-t uses
scipy's stream in the reference; engine uses numpy standard_t, moments-
tested, same as the non-confounded kernels).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..dsl.registry import equations
from .kernel import (
    _adaptive_timestamps_noreseed,
    _block_pattern,
    _draw,
    _seed_all,
    _nearest_lag_indices,
)


def _parse_poly_links_u(eqs: list[str]) -> dict[tuple[str, int, str, int], float]:
    """extract_coefficients_from_equations (b1c.py:160-202, same code in
    b2c/d2c): '+'-split with quirk Q1 (cubic tails discarded), keys
    (source, lag<=0, target, power); U terms get lag 0 and keep their
    declared power."""
    links: dict[tuple[str, int, str, int], float] = {}
    for eq in eqs:
        if "=" not in eq:
            continue
        left, right = [s.strip() for s in eq.split("=")]
        if "e" in right and len(right.split("+")) == 1:
            continue  # pure-noise equations (U[t] = eU)
        tgt = left.split("[")[0]
        for raw in right.split("+"):
            term = raw.strip()
            if "*" not in term or not ("X" in term or "U" in term):
                continue
            parts = term.split("*")
            coeff = float(parts[0].strip())
            var_part = parts[1].strip()
            base = var_part.split("^")[0] if "^" in var_part else var_part
            var = base.split("[")[0]
            power = int(var_part.split("^")[1].split(" ")[0]) if "^" in var_part else 1
            if var == "U":
                lag = 0
            else:
                lag_part = base.split("[")[1].split("]")[0]
                lag = 0 if lag_part == "t" else -int(lag_part.split("-")[1])
            links[(var, lag, tgt, power)] = coeff
    return links


def _poly_u_step(X, U, t, links, noise, n_vars, lag_of):
    """Shared B1C/B2C/D2C per-t evaluator (b1c.py:120-137): U first from the
    last noise slot, then reverse index order, powers honored for U too,
    noise added unconditionally. ``lag_of(k)`` maps a positive lag to the
    row index (t-k for regular time, nearest-abs index for irregular)."""
    U[t] = noise[-1]
    # Reference parity: b1c.py's U^2 polynomials overflow float64 for some
    # B/C-confounded configs and the reference keeps the resulting inf —
    # the corpus regenerates bit-exactly BECAUSE we overflow identically.
    # Silence only the expected scalar-power overflow so the intentional
    # behavior isn't mistaken for a defect in audit logs.
    with np.errstate(over="ignore"):
        for i in range(n_vars - 1, -1, -1):
            name = f"X{i + 1}"
            value = 0.0
            for (src, lag, tgt, power), coef in links.items():
                if tgt != name:
                    continue
                if src == "U":
                    value += coef * (U[t] ** power)
                else:
                    si = int(src[1:]) - 1
                    v = X[t, si] if lag == 0 else X[lag_of(abs(lag)), si]
                    value += coef * (v ** power)
            X[t, i] = value + noise[i]


def _frame(X, U, time) -> pd.DataFrame:
    out = pd.DataFrame(X, columns=[f"X{i + 1}" for i in range(X.shape[1])])
    out["U"] = U
    out["time"] = time
    return out


def generate_confounded_poly_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    noise_type: str = "gaussian",
    seed: int = 42,
    noise_scale: float = 0.1,
    df: int = 3,
) -> pd.DataFrame:
    """B1C: polynomial + U^2, regular sampling (b1c.py:95-158). Warmup rows
    interleave an n_vars X draw and a 1-draw U per row (b1c.py:146-148)."""
    links = _parse_poly_links_u(equations("b1c", n_vars, max_lag))
    if not links:
        raise ValueError(f"no b1c registry for ({n_vars}, {max_lag})")
    _seed_all(seed, "percall")  # t-stream idiom of this family's script (see _seed_all)
    X = np.zeros((n_points, n_vars))
    U = np.zeros(n_points)
    for i in range(max_lag):
        X[i] = _draw(noise_type, n_vars, noise_scale, df)
        U[i] = _draw(noise_type, 1, noise_scale, df)[0]
    for t in range(max_lag, n_points):
        noise = _draw(noise_type, n_vars + 1, noise_scale, df)
        _poly_u_step(X, U, t, links, noise, n_vars, lambda k: t - k)
    return _frame(X, U, np.arange(n_points))


def _mixed_noise(size: int, mix_ratio: float, scale: float) -> np.ndarray:
    """b2c.py:78-84 draw order: uniform mask, then gaussian, then laplace."""
    mask = np.random.random(size) < mix_ratio
    g = np.random.normal(0, scale, size)
    l = np.random.laplace(0, scale, size)
    return np.where(mask, g, l)


def generate_confounded_poly_mixture_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    mix_ratio: float = 0.5,
    seed: int = 42,
    noise_scale: float = 0.1,
) -> pd.DataFrame:
    """B2C: polynomial + U^2 over irregular time with mixture noise
    (b2c.py:137-165): timestamps first, then interleaved X/U warmup draws,
    then per-t mixture draws of n_vars+1."""
    links = _parse_poly_links_u(equations("b2c", n_vars, max_lag))
    if not links:
        raise ValueError(f"no b2c registry for ({n_vars}, {max_lag})")
    _seed_all(seed)
    X = np.zeros((n_points, n_vars))
    U = np.zeros(n_points)
    ts = _adaptive_timestamps_noreseed(n_points)
    for i in range(max_lag):
        X[i] = _mixed_noise(n_vars, mix_ratio, noise_scale)
        U[i] = _mixed_noise(1, mix_ratio, noise_scale)[0]
    mean_diff = np.mean(np.diff(ts))  # loop-invariant (Q5 full-series look-ahead)
    for t in range(max_lag, n_points):
        li = _nearest_lag_indices(ts, t, mean_diff, max_lag)
        noise = _mixed_noise(n_vars + 1, mix_ratio, noise_scale)
        _poly_u_step(X, U, t, links, noise, n_vars, lambda k: li[k - 1])
    return _frame(X, U, ts)


def generate_confounded_block_missing_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    noise_type: str = "gaussian",
    block_prob: float = 0.2,
    seed: int = 42,
    noise_scale: float = 0.1,
    df: int = 3,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """D2C: (missing_df, complete_df) — B1C-style polynomial irregular
    dynamics + Markov block mask on X only; U always observed
    (d2c.py:227-264, mask d2c.py:169-195)."""
    links = _parse_poly_links_u(equations("d2c", n_vars, max_lag))
    if not links:
        raise ValueError(f"no d2c registry for ({n_vars}, {max_lag})")
    _seed_all(seed, "global")  # t-stream idiom of this family's script (see _seed_all)
    X = np.zeros((n_points, n_vars))
    U = np.zeros(n_points)
    ts = _adaptive_timestamps_noreseed(n_points)
    for i in range(max_lag):
        X[i] = _draw(noise_type, n_vars, noise_scale, df)
        U[i] = _draw(noise_type, 1, noise_scale, df)[0]
    mean_diff = np.mean(np.diff(ts))  # loop-invariant (Q5 full-series look-ahead)
    for t in range(max_lag, n_points):
        li = _nearest_lag_indices(ts, t, mean_diff, max_lag)
        noise = _draw(noise_type, n_vars + 1, noise_scale, df)
        _poly_u_step(X, U, t, links, noise, n_vars, lambda k: li[k - 1])
    mask = _block_pattern(n_points, n_vars, block_prob)
    Xm = X.copy()
    Xm[mask] = np.nan
    return _frame(Xm, U, ts), _frame(X, U, ts)


# ---------------------------------------------------------------------------
# C1C: trig + trend/season + linear U, regular sampling (c1c.py:130-295).
# ---------------------------------------------------------------------------


def _ev_c1c(term: str, X: np.ndarray, U: np.ndarray, t: int) -> float:
    """c1c.py evaluate_term (162-236): direct X reads (no memo), t-lagval
    guards, U strictly linear (registry declares it linear)."""
    parts = term.split("*")
    coef = float(parts[0].strip())
    expr = parts[1].strip()
    if expr.startswith("U["):
        return coef * U[t]  # only U[t] appears in the registry
    if "[t-" in expr and not any(f in expr for f in ("cos", "sin", "^")):
        vi = int(expr.split("X")[1].split("[")[0]) - 1
        lag = int(expr.split("[")[1].split("]")[0].split("-")[1])
        return coef * X[t - lag, vi] if t - lag >= 0 else 0.0
    for fname, fn in (("cos(", np.cos), ("sin(", np.sin)):
        if fname in expr:
            inner = expr.split(fname)[1].split(")")[0]
            vi = int(inner.split("X")[1].split("[")[0]) - 1
            lag_str = inner.split("[")[1].split("]")[0]
            lag = int(lag_str.split("-")[1]) if "t-" in lag_str else 0
            v = X[t - lag, vi] if t - lag >= 0 else 0.0
            return coef * fn(v * np.pi / 2)
    if "^" in expr:
        power = int(expr.split("^")[1])
        vi = int(expr.split("X")[1].split("[")[0]) - 1
        if "[t]" in expr:
            v = X[t, vi]
        else:
            lag = int(expr.split("-")[1].split("]")[0]) if "[t-" in expr else 0
            v = X[t - lag, vi] if t - lag >= 0 else 0.0
        return coef * (v ** power)
    vi = int(expr.split("X")[1].split("[")[0]) - 1
    if "[t-" in expr:
        lag = int(expr.split("[")[1].split("]")[0].split("-")[1])
        v = X[t - lag, vi] if t - lag >= 0 else 0.0
    else:
        v = X[t, vi]
    return coef * v


def generate_confounded_trend_season_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    trend_strength: float = 0.01,
    seasonal_strength: float = 0.5,
    seasonal_period: int = 12,
    seed: int = 42,
    noise_scale: float = 0.1,
) -> pd.DataFrame:
    """C1C: trig dynamics + index-based trend/seasonality + linear U
    (c1c.py:275-295): warmup rows interleave X/U draws then add trend and
    seasonality to X only; per-t draws of n_vars+1 with U last, list-order
    equation evaluation."""
    eqs = equations("c1c", n_vars, max_lag)
    if not eqs:
        raise ValueError(f"no c1c registry for ({n_vars}, {max_lag})")
    _seed_all(seed)
    tt = np.arange(n_points)
    trends = [trend_strength * (i + 1) * 0.5 * tt for i in range(n_vars)]
    seas = []
    for i in range(n_vars):
        ph = 2 * np.pi * i / 8
        seas.append(
            seasonal_strength
            * (
                np.sin(2 * np.pi * tt / seasonal_period + ph)
                + 0.5 * np.cos(4 * np.pi * tt / seasonal_period + ph)
            )
        )
    X = np.zeros((n_points, n_vars))
    U = np.zeros(n_points)
    for i in range(max_lag):
        X[i] = np.random.normal(0, noise_scale, n_vars)
        U[i] = np.random.normal(0, noise_scale, 1)[0]
        for j in range(n_vars):
            X[i, j] += trends[j][i] + seas[j][i]
    for t in range(max_lag, n_points):
        noise = np.random.normal(0, noise_scale, n_vars + 1)
        U[t] = noise[-1]
        for eq in eqs:
            if "=" not in eq or eq.startswith("U["):
                continue
            left, right = eq.split("=")
            name = left.strip().split("[")[0]
            vi = int(name[1:]) - 1
            value = 0.0
            for raw in right.strip().split("+"):
                term = raw.strip()
                if term.startswith("e"):
                    value += noise[vi]
                elif term.startswith("trend"):
                    value += trends[vi][t]
                elif term.startswith("season"):
                    value += seas[vi][t]
                else:
                    value += _ev_c1c(term, X, U, t)
            X[t, vi] = value
    return _frame(X, U, tt)


# ---------------------------------------------------------------------------
# C2C / D3C: trig + continuous-time seasonality over irregular time, with U.
# ---------------------------------------------------------------------------


def _ev_trig_u(term: str, X, U, t: int, li: list[int]) -> float:
    """c2c.py/d3c.py evaluate_term (c2c.py:174-236): identical to the C2/D3
    evaluator plus the U branch — which is LINEAR for any declared power
    (the ``expr == 'U[t]'`` test at c2c.py:180 makes the power sub-branch
    unreachable for 'U[t]^2')."""
    parts = term.split("*")
    coef = float(parts[0].strip())
    expr = parts[1].strip()
    if expr.startswith("U["):
        return coef * U[t]
    if "[t-" in expr and not any(f in expr for f in ("cos", "sin", "^")):
        vi = int(expr[1]) - 1
        lag = int(expr.split("-")[1].split("]")[0])
        return coef * X[li[lag - 1], vi]
    for fname, fn in (("cos(", np.cos), ("sin(", np.sin)):
        if fname in expr:
            inner = expr.split(fname)[1].split(")")[0]
            vi = int(inner.split("X")[1].split("[")[0]) - 1
            if "[t-" in inner:
                lag = int(inner.split("-")[1].split("]")[0])
                v = X[li[lag - 1], vi]
            else:
                v = X[t, vi]
            return coef * fn(v * np.pi / 2)
    if "^" in expr:
        power = int(expr.split("^")[1])
        vi = int(expr.split("X")[1].split("[")[0]) - 1
        if "[t-" in expr:
            lag = int(expr.split("-")[1].split("]")[0])
            v = X[li[lag - 1], vi]
        else:
            v = X[t, vi]
        return coef * (v ** power)
    vi = int(expr.split("X")[1].split("[")[0]) - 1
    if "[t-" in expr:
        lag = int(expr.split("-")[1].split("]")[0])
        v = X[li[lag - 1], vi]
    else:
        v = X[t, vi]
    return coef * v


def _trig_irregular_u_core(
    eqs: list[str],
    n_points: int,
    n_vars: int,
    max_lag: int,
    step_noise_fn,
    warmup_x_fn,
    warmup_u_fn,
    trend_strength: float,
    seasonal_strength: float,
    seasonal_period: int,
):
    """Shared C2C/D3C machinery (c2c.py:270-310, d3c.py:365-395):
    timestamps first, index trend + continuous-time seasonality, interleaved
    X/U warmup draws (trend+season added to X only), per-t noise of
    n_vars+1 with U taking the last slot, list-order evaluation."""
    ts = _adaptive_timestamps_noreseed(n_points)
    tt = np.arange(n_points)
    trends = [trend_strength * (i + 1) * 0.5 * tt for i in range(n_vars)]
    seas = []
    for i in range(n_vars):
        ph = 2 * np.pi * i / 8
        seas.append(
            seasonal_strength
            * (
                np.sin(2 * np.pi * ts / seasonal_period + ph)
                + 0.5 * np.cos(4 * np.pi * ts / seasonal_period + ph)
            )
        )
    X = np.zeros((n_points, n_vars))
    U = np.zeros(n_points)
    for i in range(max_lag):
        X[i] = warmup_x_fn()
        U[i] = warmup_u_fn()
        for j in range(n_vars):
            X[i, j] += trends[j][i] + seas[j][i]
    mean_diff = np.mean(np.diff(ts))  # loop-invariant (Q5 full-series look-ahead)
    for t in range(max_lag, n_points):
        li = _nearest_lag_indices(ts, t, mean_diff, max_lag)
        noise = step_noise_fn()
        U[t] = noise[-1]
        for eq in eqs:
            if "=" not in eq or eq.startswith("U["):
                continue
            left, right = eq.split("=")
            name = left.split("[")[0]
            vi = int(name[1:]) - 1
            value = 0.0
            for raw in right.split("+"):
                term = raw.strip()
                if term.startswith("e"):
                    value += noise[vi]
                elif term.startswith("trend"):
                    value += trends[vi][t]
                elif term.startswith("season"):
                    value += seas[vi][t]
                else:
                    value += _ev_trig_u(term, X, U, t, li)
            X[t, vi] = value
    return X, U, ts


def generate_confounded_trig_irregular_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    noise_type: str = "gaussian",
    trend_strength: float = 0.01,
    seasonal_strength: float = 0.5,
    seasonal_period: int = 12,
    seed: int = 42,
    noise_scale: float = 0.1,
    df: int = 3,
) -> pd.DataFrame:
    """C2C (c2c.py:116-310): warmup U draws are plain 1-draws; per-t draws
    are n_vars+1; U effectively linear (see _ev_trig_u)."""
    eqs = equations("c2c", n_vars, max_lag)
    if not eqs:
        raise ValueError(f"no c2c registry for ({n_vars}, {max_lag})")
    _seed_all(seed)
    X, U, ts = _trig_irregular_u_core(
        eqs, n_points, n_vars, max_lag,
        lambda: _draw(noise_type, n_vars + 1, noise_scale, df),
        lambda: _draw(noise_type, n_vars, noise_scale, df),
        lambda: _draw(noise_type, 1, noise_scale, df)[0],
        trend_strength, seasonal_strength, seasonal_period,
    )
    return _frame(X, U, ts)


def generate_confounded_mixed_missing_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    mix_ratio: float = 0.5,
    mcar_prob: float = 0.05,
    block_prob: float = 0.05,
    trend_strength: float = 0.01,
    seasonal_strength: float = 0.5,
    seasonal_period: int = 12,
    seed: int = 42,
    noise_scale: float = 0.1,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """D3C (d3c.py:171-409): mixture noise everywhere; warmup U rows call
    generate_mixed_noise(1, include_confounder=True), consuming three
    size-2 arrays and keeping the LAST element (d3c.py:188-203, 384);
    per-t draws are single size-(n_vars+1) mixture arrays. MCAR mask draws
    first, then the block walk; union applied to X only (d3c.py:218-245)."""
    eqs = equations("d3c", n_vars, max_lag)
    if not eqs:
        raise ValueError(f"no d3c registry for ({n_vars}, {max_lag})")
    _seed_all(seed)
    X, U, ts = _trig_irregular_u_core(
        eqs, n_points, n_vars, max_lag,
        lambda: _mixed_noise(n_vars + 1, mix_ratio, noise_scale),
        lambda: _mixed_noise(n_vars, mix_ratio, noise_scale),
        lambda: _mixed_noise(2, mix_ratio, noise_scale)[-1],
        trend_strength, seasonal_strength, seasonal_period,
    )
    mcar = np.random.random((n_points, n_vars)) < mcar_prob
    block = _block_pattern(n_points, n_vars, block_prob)
    mask = mcar | block
    Xm = X.copy()
    Xm[mask] = np.nan
    return _frame(Xm, U, ts), _frame(X, U, ts)


# ---------------------------------------------------------------------------
# D1C: linear two-pass + MCAR + U (d1c.py:116-254).
# ---------------------------------------------------------------------------


def generate_confounded_mcar_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    noise_type: str = "gaussian",
    missing_rate: float = 0.2,
    seed: int = 42,
    noise_scale: float = 0.1,
    df: int = 3,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """D1C: (missing_df, complete_df). Replicates d1c.py:135-217 verbatim,
    including the pass-1 memo-shadowing bug (the inner loop reassigns
    ``var_name`` to the SOURCE variable, so the computed value is recorded
    under the wrong key and pass 2 recomputes/skips the wrong set —
    corpus-confirmed). Equations with any 't]' term (contemporaneous X or
    U[t]) defer to pass 2. MCAR applies to X only; U is fully observed."""
    eqs = equations("d1c", n_vars, max_lag)
    if not eqs:
        raise ValueError(f"no d1c registry for ({n_vars}, {max_lag})")
    _seed_all(seed, "global")  # t-stream idiom of this family's script (see _seed_all)
    X = np.zeros((n_points, n_vars))
    U = np.zeros(n_points)
    for i in range(max_lag):
        X[i] = _draw(noise_type, n_vars, noise_scale, df)
        U[i] = _draw(noise_type, 1, noise_scale, df)[0]

    for t in range(max_lag, n_points):
        noise = _draw(noise_type, n_vars + 1, noise_scale, df)
        var_values: dict[str, float] = {}
        U[t] = noise[-1]
        var_values["U"] = U[t]

        # Pass 1: equations with no same-t terms (no 't]' substring).
        for eq in eqs:
            if "=" not in eq or eq.startswith("U[t]"):
                continue
            left, right = eq.split("=")
            var_name = left.split("[")[0]
            var_idx = int(var_name[1:]) - 1
            if any("t]" in term for term in right.split("+")):
                continue
            value = 0.0
            for term in (s.strip() for s in right.split("+")):
                if term.startswith("e"):
                    value += noise[var_idx]
                else:
                    coef = float(term.split("*")[0].strip())
                    var = term.split("*")[1].strip()
                    var_name = var.split("[")[0].strip()  # shadows the target!
                    time_idx = var.split("[")[1].split("]")[0].strip()
                    if var_name == "U":
                        value += coef * U[t]
                    else:
                        src_idx = int(var_name[1:]) - 1
                        lag = int(time_idx.split("-")[1])
                        value += coef * X[t - lag, src_idx]
            X[t, var_idx] = value
            var_values[var_name] = value  # wrong key when terms exist (bug)

        # Pass 2: everything not already (mis)recorded.
        for eq in eqs:
            if "=" not in eq or eq.startswith("U[t]"):
                continue
            left, right = eq.split("=")
            var_name = left.split("[")[0]
            var_idx = int(var_name[1:]) - 1
            if var_name in var_values:
                continue
            value = 0.0
            for term in (s.strip() for s in right.split("+")):
                if term.startswith("e"):
                    value += noise[var_idx]
                else:
                    coef = float(term.split("*")[0].strip())
                    var = term.split("*")[1].strip()
                    src_name = var.split("[")[0].strip()
                    time_idx = var.split("[")[1].split("]")[0].strip()
                    if src_name == "U":
                        value += coef * U[t]
                    elif time_idx == "t":
                        src_idx = int(src_name[1:]) - 1
                        value += coef * var_values.get(src_name, X[t, src_idx])
                    else:
                        src_idx = int(src_name[1:]) - 1
                        lag = int(time_idx.split("-")[1])
                        value += coef * X[t - lag, src_idx]
            X[t, var_idx] = value
            var_values[var_name] = value

    mask = np.random.random(X.shape) < missing_rate
    Xm = X.copy()
    Xm[mask] = np.nan
    tt = np.arange(n_points)
    return _frame(Xm, U, tt), _frame(X, U, tt)


# ---------------------------------------------------------------------------
# A2C: linear + U over irregular time (Codes/a2c.py:116-223).
# ---------------------------------------------------------------------------


def _parse_a2c_links(eqs: list[str]) -> dict[tuple[str, int, str], float]:
    """extract_coefficients_from_equations (a2c.py:227-250) — including its
    fatal guard: ``'e' not in eq.split('=')[1]`` skips any equation whose
    RHS contains the letter 'e'. Every registry equation carries a noise
    term ('+ e4'), so the returned link dict is EMPTY and the generator's
    causal pass never fires (corpus-confirmed: A2C datasets are pure noise).
    Replicated rather than fixed so the kernel matches the shipped data."""
    links: dict[tuple[str, int, str], float] = {}
    for eq in eqs:
        if "=" not in eq or "e" in eq.split("=")[1]:
            continue
        left, right = [s.strip() for s in eq.split("=")]
        tgt = left.split("[")[0]
        for raw in right.split("+"):
            term = raw.strip()
            if "*" not in term:
                continue
            coeff, var_part = [p.strip() for p in term.split("*")[:2]]
            var = var_part.split("[")[0]
            if var == "U":
                lag = 0
            else:
                lag_part = var_part.split("[")[1].split("]")[0]
                lag = 0 if lag_part == "t" else -int(lag_part.split("-")[1])
            links[(var, lag, tgt)] = float(coeff)
    return links


def generate_confounded_irregular_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    noise_type: str = "gaussian",
    seed: int = 42,
    noise_scale: float = 0.1,
    df: int = 3,
) -> pd.DataFrame:
    """A2C (a2c.py:154-223): double re-seed (Q4 — once in the driver, again
    inside timestamp generation), interleaved X/U warmup, per-t draws of
    n_vars+1 with U last. Because _parse_a2c_links returns {} for the real
    registry, every X cell is exogenous: the ``value != 0`` noise gate
    (a2c.py:190-192) never rewrites it, leaving pure noise — bit-exact vs
    the shipped A2C corpus."""
    from .kernel import irregular_timestamps

    links = _parse_a2c_links(equations("a2c", n_vars, max_lag))
    _seed_all(seed, "percall")  # t-stream idiom of this family's script (see _seed_all)
    X = np.zeros((n_points, n_vars))
    U = np.zeros(n_points)
    ts = irregular_timestamps(n_points, seed=seed)  # re-seeds (Q4)
    for i in range(max_lag):
        X[i] = _draw(noise_type, n_vars, noise_scale, df)
        U[i] = _draw(noise_type, 1, noise_scale, df)[0]
    targets = {t for (_, _, t) in links}
    mean_diff = np.mean(np.diff(ts))  # loop-invariant (Q5 full-series look-ahead)
    for t in range(max_lag, n_points):
        li = _nearest_lag_indices(ts, t, mean_diff, max_lag)
        noise = _draw(noise_type, n_vars + 1, noise_scale, df)
        U[t] = noise[-1]
        for i in range(n_vars):
            if f"X{i + 1}" not in targets:
                X[t, i] = noise[i]
        for i in range(n_vars - 1, -1, -1):
            name = f"X{i + 1}"
            value = 0.0
            for (src, lag, tgt), coef in links.items():
                if tgt != name:
                    continue
                if src == "U":
                    value += coef * U[t]
                else:
                    si = int(src[1:]) - 1
                    value += coef * (X[t, si] if lag == 0 else X[li[abs(lag) - 1], si])
            if value != 0:
                X[t, i] = value + noise[i]
    return _frame(X, U, ts)
