from .detrand import lcg_uniform_sql, gaussian_sql, laplace_sql, exponential_sql
from .numeric import dsum, davg, ts_us

__all__ = [
    "lcg_uniform_sql",
    "gaussian_sql",
    "laplace_sql",
    "exponential_sql",
    "dsum",
    "davg",
    "ts_us",
]
