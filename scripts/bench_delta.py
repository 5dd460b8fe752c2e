"""Round-over-round bench comparison: print a markdown delta table between
two BENCH_full.json records (paths or git refs like HEAD~1:BENCH_full.json).

    python scripts/bench_delta.py old.json new.json [--top 20]

Reads the steady per-query column of each record, joins on query id, and
reports the largest movers plus totals — the committed artifact VERDICT r08
item 7 asks for, so round comparisons don't depend on BENCH_full.json being
overwritten in place.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys


def _load(ref: str) -> dict:
    if ":" in ref and not ref.endswith(".json") or ref.count(":") == 1 and not ref.startswith("/"):
        try:
            out = subprocess.run(
                ["git", "show", ref], capture_output=True, text=True, check=True
            ).stdout
            return json.loads(out)
        except (subprocess.CalledProcessError, json.JSONDecodeError):
            pass
    with open(ref) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        rows.append((name, a, b, (b - a) if a is not None and b is not None else None))

    movers = sorted(
        (r for r in rows if r[3] is not None), key=lambda r: abs(r[3]), reverse=True
    )[: args.top]
    added = [r[0] for r in rows if r[1] is None]
    removed = [r[0] for r in rows if r[2] is None]

    print(f"| metric | old | new |")
    print(f"|---|---|---|")
    for key in ("value", "spark_oracle_total", "duck_total", "ratio_overall", "sf"):
        print(f"| {key} | {old.get(key)} | {new.get(key)} |")
    print(f"| queries | {len(oq)} | {len(nq)} |")
    print()
    print(f"| query | old s | new s | delta s |")
    print(f"|---|---|---|---|")
    for name, a, b, d in movers:
        print(f"| {name} | {a} | {b} | {d:+.2f} |")
    if added:
        print(f"\nadded: {', '.join(added)}")
    if removed:
        print(f"\nremoved: {', '.join(removed)}")


if __name__ == "__main__":
    sys.exit(main())
