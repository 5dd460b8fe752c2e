"""Quick steady-state profiler for named queries at sf0.1.

Usage: python scripts/profile_queries.py sliding_agg bpe_pairs ...
Prints per-query steady (min of N) Spark seconds and the DuckDB oracle
seconds, reusing bench.py's noop-sink methodology.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synth_timeseries_data_spark.queries import all_queries  # noqa: E402
from synth_timeseries_data_spark.session import get_session  # noqa: E402

_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    runs = int(os.environ.get("PROFILE_RUNS", "4"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("profile")
    queries = all_queries()
    queries["lag_features"].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    import duckdb

    con = duckdb.connect()
    for t in _TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    for name in names:
        q = queries[name]
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        dt = float("nan")
        if q.oracle is not None:
            con.execute(q.oracle).arrow()
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(q.oracle).arrow()
                dt = min(dt, time.perf_counter() - t0)
        ratio = best / dt if dt == dt and dt > 0 else float("nan")
        print(f"{name:25s} spark={best:7.3f}s duck={dt:7.4f}s ratio={ratio:6.2f}x")


if __name__ == "__main__":
    main()
