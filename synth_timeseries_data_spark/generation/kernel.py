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
