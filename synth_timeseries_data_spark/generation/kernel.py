"""Sequential SCM recurrence kernel — tier-(b) reference-fidelity generation.

The reference generates each dataset with a per-timestep Python loop
(Codes/a1.py:194-212: seed `max_lag` warmup rows with noise, then roll
forward calling the equation evaluator at :137-192, which resolves
contemporaneous terms through a per-timestep memo in reverse variable order
and lagged terms from the matrix). That recurrence is inherently sequential
in t, so the engine's scale-out axis is ACROSS configurations
(SURVEY.md §4.3.1): `groupBy(config).applyInPandas(...)` runs one kernel per
config — millions of independent series parallelize embarrassingly; time
stays a tight loop inside one partition, same as the reference.

Numeric fidelity: with noise_type='gaussian' and the same seed this kernel
reproduces the reference's CSVs bit-for-bit (term accumulation follows the
equation's textual term order; noise draw order is warmup rows first, then
one n_vars draw per timestep). Student-t uses numpy's standard_t stream
(scipy is not available here) — same distribution and scale as the
reference's stats.t.rvs (a1.py:133), different RNG stream; validated by
moment tests instead of value equality.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..dsl.registry import equations

_TERM_RE = re.compile(r"^([0-9]+\.?[0-9]*)\s*\*\s*X([0-9]+)\[t(?:-([0-9]+))?\]$")


def parse_linear_equation(eq: str):
    """One linear DSL string → (target_idx0, ordered term list).

    Terms are kept in textual order because float accumulation order is part
    of the fidelity contract. Each term is ('noise',) or
    ('var', coef, source_idx0, lag).
    """
    left, right = [s.strip() for s in eq.split("=")]
    target = int(left.split("[")[0][1:]) - 1
    terms = []
    for raw in right.split("+"):
        term = raw.strip()
        if term.startswith("e"):
            terms.append(("noise",))
            continue
        m = _TERM_RE.match(term)
        if not m:
            raise ValueError(f"unparseable linear term: {term!r}")
        coef, src, lag = float(m.group(1)), int(m.group(2)) - 1, int(m.group(3) or 0)
        terms.append(("var", coef, src, lag))
    return target, terms


def topo_order(parsed: dict[int, list], n_vars: int) -> list[int]:
    """Kahn topological sort of the CONTEMPORANEOUS dependency graph (lagged
    deps never constrain within-t order). Raises on a same-t cycle.

    The reference never sorts: it evaluates in fixed reverse index order
    (a1.py:147) — valid for its registries because contemporaneous chains
    always point from higher to lower index. This sort generalizes to any
    acyclic DSL; ties broken by descending index so registry configs get the
    reference's exact order.
    """
    deps = {v: {s for kind, *rest in parsed.get(v, []) if kind == "var"
                for c, s, l in [rest] if l == 0} for v in range(n_vars)}
    order, done = [], set()
    while len(order) < n_vars:
        ready = sorted(
            (v for v in range(n_vars) if v not in done and deps[v] <= done),
            reverse=True,
        )
        if not ready:
            raise ValueError("contemporaneous cycle in equation system")
        order.append(ready[0])
        done.add(ready[0])
    return order


def _draw(rng_kind: str, n: int, scale: float, df: int) -> np.ndarray:
    if rng_kind == "gaussian":
        return np.random.normal(0, scale, size=n)
    if rng_kind == "student_t":
        return np.random.standard_t(df, size=n) * scale
    raise ValueError(f"unknown noise type: {rng_kind}")


def generate_linear_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    noise_type: str = "gaussian",
    seed: int = 42,
    noise_scale: float = 0.1,
    df: int = 3,
    use_reference_order: bool = True,
) -> pd.DataFrame:
    """Generate one linear-family dataset (wide: X1..Xn + time).

    Mirrors a1.py:194-212 exactly: global seed, warmup rows of pure noise,
    then per-t evaluation in reverse variable order with the contemporaneous
    memo falling back to the (zero-initialized) current row — including that
    quirky fallback, which is reachable only for DSLs the registry never
    produces but is part of the effective semantics.
    """
    eqs = equations("a1", n_vars, max_lag)
    if not eqs:
        raise ValueError(f"no linear registry for ({n_vars}, {max_lag})")
    parsed: dict[int, list] = {}
    for eq in eqs:
        tgt, terms = parse_linear_equation(eq)
        parsed[tgt] = terms
    order = (
        list(range(n_vars - 1, -1, -1))
        if use_reference_order
        else topo_order(parsed, n_vars)
    )

    np.random.seed(seed)
    X = np.zeros((n_points, n_vars))
    for i in range(max_lag):
        X[i] = _draw(noise_type, n_vars, noise_scale, df)

    for t in range(max_lag, n_points):
        noise = _draw(noise_type, n_vars, noise_scale, df)
        var_values: dict[int, float] = {}
        for v in order:
            terms = parsed.get(v)
            if terms is None:
                continue
            value = 0.0
            for term in terms:
                if term[0] == "noise":
                    value += noise[v]
                else:
                    _, coef, src, lag = term
                    if lag == 0:
                        value += coef * var_values.get(src, X[t, src])
                    else:
                        value += coef * X[t - lag, src]
            X[t, v] = value
            var_values[v] = value

    out = pd.DataFrame(X, columns=[f"X{i + 1}" for i in range(n_vars)])
    out["time"] = np.arange(n_points)
    return out


# ---------------------------------------------------------------------------
# A2: irregular sampling + nearest-abs lag resolution (Codes/a2.py:131-233).
# ---------------------------------------------------------------------------


def irregular_timestamps(
    n_points: int,
    total_time: float = 100.0,
    min_gap: float = 0.1,
    seed: int | None = 42,
) -> np.ndarray:
    """Adaptive-scale exponential gaps with a min-gap floor and rescale-on-
    overflow (a2.py:146-160). The reference RE-SEEDS inside this function
    (quirk Q4) — replicated so draw choreography matches."""
    if seed is not None:
        np.random.seed(seed)
    times = np.zeros(n_points)
    times[0] = np.random.uniform(0, min_gap)
    for i in range(1, n_points):
        gap = np.random.exponential(scale=(total_time - times[i - 1]) / (n_points - i))
        times[i] = times[i - 1] + max(gap, min_gap)
        if times[i] > total_time:
            times = times * (total_time / times[i])
    return times


def generate_irregular_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    noise_type: str = "gaussian",
    seed: int = 42,
    noise_scale: float = 0.1,
    df: int = 3,
    ts_mode: str = "adaptive_exp",
) -> pd.DataFrame:
    """Irregular-sampling linear family (a2.py:203-233).

    Semantics replicated exactly: per-t full-series mean(diff) look-ahead
    (Q5), nearest-abs lag index over the prefix (a2.py:162-167), the
    exogenous pass for non-target variables (Q3's noise_extra), noise
    gating `if value != 0` (Q2), and contemporaneous reads straight from
    the current row (no memo — evaluation order covers the registry DAGs).

    ts_mode:
      'adaptive_exp' — the current reference algorithm (a2.py:146-160);
      'linspace'     — evenly spaced, zero draws consumed. The shipped A2
                       corpus was generated this way (every file's `time`
                       column is exactly linspace(0, 100, n) and the values
                       replay the regular-lag recurrence), so this mode
                       reproduces those CSVs bit-for-bit.
    """
    from ..dsl.registry import equations

    eqs = equations("a2", n_vars, max_lag)
    if not eqs:
        raise ValueError(f"no a2 registry for ({n_vars}, {max_lag})")
    # a2 parser semantics (a2.py:108-129): skip 'noise' equations entirely,
    # keep insertion order — iteration order feeds accumulation order.
    links: dict[tuple[str, int, str], float] = {}
    for eq in eqs:
        if "=" not in eq or "noise" in eq:
            continue
        left, right = [s.strip() for s in eq.split("=")]
        tgt = left.split("[")[0]
        for raw in right.split("+"):
            term = raw.strip()
            if "*" in term and "X" in term:
                coeff, var_part = [p.strip() for p in term.split("*")]
                var = var_part.split("[")[0]
                lag_part = var_part.split("[")[1].split("]")[0]
                lag = 0 if lag_part == "t" else -int(lag_part.split("-")[1])
                links[(var, lag, tgt)] = float(coeff)

    np.random.seed(seed)
    X = np.zeros((n_points, n_vars))
    if ts_mode == "linspace":
        ts = np.linspace(0.0, 100.0, n_points)
    elif ts_mode == "adaptive_exp":
        ts = irregular_timestamps(n_points, seed=seed)
    else:
        raise ValueError(f"unknown ts_mode: {ts_mode}")

    for i in range(max_lag):
        X[i] = _draw(noise_type, n_vars, noise_scale, df)

    targets = [t for (_, _, t) in links]
    for t in range(max_lag, n_points):
        mean_diff = np.mean(np.diff(ts))
        lag_idx = [
            int(np.abs(ts[:t] - (ts[t] - k * mean_diff)).argmin()) if t > 0 else 0
            for k in range(1, max_lag + 1)
        ]
        noise = _draw(noise_type, n_vars, noise_scale, df)
        for i in range(n_vars):
            if f"X{i + 1}" not in targets:
                X[t, i] = noise[i]
        for i in range(n_vars - 1, -1, -1):
            var_name = f"X{i + 1}"
            value = 0.0
            for (src, lag, tgt), coef in links.items():
                if tgt != var_name:
                    continue
                si = int(src[1:]) - 1
                if lag == 0:
                    value += coef * X[t, si]
                else:
                    value += coef * X[lag_idx[abs(lag) - 1], si]
            if value != 0:
                X[t, i] = value + noise[i]

    out = pd.DataFrame(X, columns=[f"X{i + 1}" for i in range(n_vars)])
    out["time"] = ts
    return out


# ---------------------------------------------------------------------------
# A1C: hidden-confounder family (Codes/a1c.py:116-277).
# ---------------------------------------------------------------------------


def generate_confounded_config(
    n_points: int,
    n_vars: int,
    max_lag: int,
    noise_type: str = "gaussian",
    seed: int = 42,
    noise_scale: float = 0.1,
    df: int = 3,
    hide_u: bool = False,
) -> pd.DataFrame:
    """Confounded linear family: U[t] = pure noise feeding two observed
    nodes, retry-queue contemporaneous scheduling (a1c.py:171-253), warmup
    rows drawing X then U separately (a1c.py:260-263), per-t draws of
    n_vars+1 with U taking the last slot. Bit-exact vs the reference's
    seed-42 A1C CSVs (4-var goldens).

    The reference writes U as an ordinary column (quirk Q8 — "hidden" only
    by convention); hide_u=True makes the hiding an explicit projection.
    """
    from ..dsl.registry import equations

    eqs = equations("a1c", n_vars, max_lag)
    if not eqs:
        raise ValueError(f"no a1c registry for ({n_vars}, {max_lag})")

    np.random.seed(seed)
    X = np.zeros((n_points, n_vars))
    U = np.zeros(n_points)
    for i in range(max_lag):
        X[i] = _draw(noise_type, n_vars, noise_scale, df)
        U[i] = _draw(noise_type, 1, noise_scale, df)[0]

    for t in range(max_lag, n_points):
        noise = _draw(noise_type, n_vars + 1, noise_scale, df)
        U[t] = noise[-1]
        var_values: dict[str, float] = {"U": U[t]}
        remaining = list(range(n_vars))[::-1]
        while remaining:
            vi = remaining[0]
            name = f"X{vi + 1}"
            eq = next((e for e in eqs if e.startswith(name)), None)
            if eq is None:
                remaining.pop(0)
                continue
            _, right = eq.split("=")
            terms = [x.strip() for x in right.split("+")]
            # deferral: a same-t X dependency not yet computed sends this
            # variable to the back of the queue (a1c.py:196-214)
            ready = True
            for term in terms:
                if term.startswith("e") or "U[t]" in term:
                    continue
                parts = term.split("*")
                if len(parts) < 2:
                    continue
                vp = parts[1].strip()
                if "[t]" in vp and vp.split("[")[0] not in var_values:
                    ready = False
                    break
            if not ready:
                remaining.pop(0)
                remaining.append(vi)
                continue
            value = 0.0
            for term in terms:
                if term.startswith("e"):
                    value += noise[vi]
                    continue
                parts = term.split("*")
                coef = float(parts[0].strip())
                var = parts[1].strip()
                if "U[t]" in var:
                    value += coef * U[t]
                    continue
                sn = var.split("[")[0].strip()
                ti = var.split("[")[1].split("]")[0].strip()
                si = int(sn[1:]) - 1
                if ti == "t":
                    value += coef * var_values.get(sn, X[t, si])
                else:
                    value += coef * X[t - int(ti.split("-")[1]), si]
            X[t, vi] = value
            var_values[name] = value
            remaining.pop(0)

    out = pd.DataFrame(X, columns=[f"X{i + 1}" for i in range(n_vars)])
    if not hide_u:
        out["U"] = U
    out["time"] = np.arange(n_points)
    return out
