"""Dump `.explain("formatted")` for named queries to plans/r10/<q>_<tag>.txt.

Usage: python scripts/dump_r10_plans.py <tag> q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     R10_OLD_CC=1 re-disables the r10 driver union-find gate so the
     inherited distributed-CC plan can be captured as the `before`.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synth_timeseries_data_spark.queries import all_queries  # noqa: E402
from synth_timeseries_data_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r10")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if os.environ.get("R10_OLD_CC"):
        import synth_timeseries_data_spark.queries.llm_pipeline as lp

        lp._CC_DRIVER_PAIRS = -1
    os.makedirs(OUT, exist_ok=True)
    spark = get_session("dump-r10-plans")
    qs = all_queries()
    for name in names:
        df = qs[name].build(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF_DIR} ({tag})\n")
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
