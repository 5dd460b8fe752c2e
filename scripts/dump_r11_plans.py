"""Dump `.explain("formatted")` for named queries to plans/r11/<q>_<tag>.txt.

Usage: python scripts/dump_r11_plans.py <tag> q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     R11_SRC — alternate repo root to import the engine from (a git
     worktree pinned at the pre-round commit) so `before` plans can be
     captured after the working tree has moved on; dumps always land in
     THIS repo's plans/r11/.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_THIS_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.environ.get("R11_SRC", _THIS_REPO))

from synth_timeseries_data_spark.queries import all_queries  # noqa: E402
from synth_timeseries_data_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(_THIS_REPO, "plans", "r11")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_session("dump-r11-plans")
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
