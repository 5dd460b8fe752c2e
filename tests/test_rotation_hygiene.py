"""Rotation-window hygiene: the driver verifies registry entries in order
and may cap how many it checks, so the engine rotates which oracle entries
sit in the first-50 window each round. The invariant (VERDICT r06 item 3
exists because a comment once got this wrong): every DEMOTED oracle entry
must carry a driver-green row in the LATEST CORRECTNESS_r*.json — then
after the upcoming round runs, no entry's attestation is ever more than
one round old. This test reads the actual driver artifacts, not comments,
so a rotation arithmetic slip fails at commit time instead of at judging.
"""

from __future__ import annotations

import glob
import json
import os
import re

from synth_timeseries_data_spark.queries import _DEMOTED, all_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recent_correctness() -> tuple[list, list]:
    """The last TWO driver records (newest first) — the invariant is
    '≤1 round old', and a demoted entry is legitimately absent from the
    newest record (only the 50-entry window appears there): right after
    the driver writes round N's record, the entries demoted for round
    N+1 carry their green row in round N-1's file until the next
    rotation swaps them back in."""
    paths = glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
    assert paths, "no driver CORRECTNESS records found"
    by_round = {
        int(re.search(r"_r(\d+)\.json$", p).group(1)): p for p in paths
    }
    rounds = sorted(by_round, reverse=True)[:2]
    records = []
    for r in rounds:
        with open(by_round[r]) as f:
            records.append(json.load(f))
    return rounds, records


def test_window_is_exactly_the_driver_cap():
    qs = all_queries()
    oracle = [n for n, q in qs.items() if q.oracle is not None]
    window = [n for n in oracle if n not in _DEMOTED]
    assert len(window) == 50, (len(window), sorted(window))
    unknown = set(_DEMOTED) - set(oracle)
    assert not unknown, f"_DEMOTED names unknown/rows-only entries: {unknown}"


def test_every_demoted_entry_is_green_within_one_round():
    rounds, records = _recent_correctness()

    def _green(row) -> bool:
        return bool(
            row
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match", True)
            and not row.get("err")
        )

    stale = [
        name
        for name in _DEMOTED
        if not any(_green(rec.get(name)) for rec in records)
    ]
    assert not stale, (
        f"demoted entries with no green row in the last two driver "
        f"records (rounds {rounds}) — their attestation is >1 round old: "
        f"{stale}"
    )
