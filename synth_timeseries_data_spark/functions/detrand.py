"""Deterministic, cross-engine pseudo-random column expressions.

The reference draws noise with seeded numpy (``Codes/a1.py:128-135`` Gaussian /
Student-t, ``Codes/b2.py:75-85`` Gaussian⊕Laplace mixture, ``Codes/d1.py:206-211``
MCAR Bernoulli). numpy's MT19937 stream is not reproducible inside Spark SQL or
DuckDB, so the engine uses a two-tier strategy (SURVEY.md §4.3.3):

tier (a) — *oracle-checkable* queries use the integer LCG below: exact 64-bit
integer arithmetic, so Spark and DuckDB produce bit-identical uniforms. Shape
transforms (Box-Muller Gaussian, inverse-CDF Laplace/exponential) then use libm
functions whose last-ulp may differ between JVM and C — consumers must round
results (ROUND(x, 6)) before hashing.

tier (b) — *reference-fidelity* generation uses numpy inside ``applyInPandas``
with per-config seeds (generation/kernel.py), validated by moments/fidelity
tests rather than value equality.

Every function returns a SQL snippet string usable verbatim in both engines:
Spark via ``F.expr(snippet)``, DuckDB by direct inclusion — one formula, two
engines, no drift.
"""

from __future__ import annotations

# Classic glibc LCG constants; the key is reduced mod 2^31 BEFORE the first
# multiply so every intermediate stays below 2^63 for ANY non-negative bigint
# key — Spark (non-ANSI) silently wraps on overflow where DuckDB raises, so
# without the reduction the cross-engine bit-identity breaks above ~4.18e9.
_A = 1103515245
_C = 12345
_M = 2147483648  # 2^31


def lcg_uniform_sql(key_expr: str, salt: int = 0) -> str:
    """U(0,1) from a non-negative integer key; identical in Spark & DuckDB.

    Two LCG steps decorrelate consecutive keys (a single step of a LCG on
    sequential ids produces a visible lattice). ``salt`` derives independent
    streams from the same key.
    """
    s1 = f"((({key_expr}) % {_M}) * {_A} + {_C + salt * 7919}) % {_M}"
    s2 = f"(({s1}) * {_A} + {_C}) % {_M}"
    # Explicit DOUBLE before the final scale: a bare `(int + 0.5) / 2^31.0`
    # parses as DECIMAL arithmetic in Spark (slow decimal division per row,
    # and engine-specific quotient scales). s2 + 0.5 and the power-of-two
    # division are exactly representable in binary64, so all-double math is
    # both fast and bit-identical across engines.
    return f"((CAST(({s2}) AS DOUBLE) + 0.5) / {_M}.0)"


def gaussian_sql(key_expr: str, salt: int = 0, mean: float = 0.0, std: float = 1.0) -> str:
    """N(mean, std²) via Box-Muller on two LCG uniforms.

    Matches the *distribution* of the reference's ``np.random.normal``
    (``Codes/a1.py:131``), not its values. Consumers must ROUND(.,6) before
    cross-engine hashing (libm cos/ln may differ in the last ulp).
    """
    u1 = lcg_uniform_sql(key_expr, salt)
    u2 = lcg_uniform_sql(key_expr, salt + 1)
    z = f"(sqrt(-2.0 * ln({u1})) * cos(2.0 * pi() * {u2}))"
    return f"({mean} + {std} * {z})"


def laplace_sql(key_expr: str, salt: int = 0, loc: float = 0.0, scale: float = 0.1) -> str:
    """Laplace(loc, scale) via inverse CDF, mirroring ``np.random.laplace``
    in the B2 mixture (``Codes/b2.py:81``)."""
    u = lcg_uniform_sql(key_expr, salt)
    # sign(u-1/2) * ln(1 - 2|u-1/2|); u in (0,1) exclusive so ln arg > 0.
    return (
        f"({loc} - {scale} * sign({u} - 0.5) * ln(1.0 - 2.0 * abs({u} - 0.5)))"
    )


def exponential_sql(key_expr: str, salt: int = 0, scale: float = 1.0) -> str:
    """Exp(scale) via inverse CDF — the irregular-timestamp gap draw
    (``Codes/a2.py:151`` ``np.random.exponential``)."""
    u = lcg_uniform_sql(key_expr, salt)
    return f"(-{scale} * ln({u}))"
