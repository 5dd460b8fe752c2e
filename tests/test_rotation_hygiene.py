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


def _latest_correctness() -> tuple[int, dict]:
    paths = glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
    assert paths, "no driver CORRECTNESS records found"
    by_round = {
        int(re.search(r"_r(\d+)\.json$", p).group(1)): p for p in paths
    }
    latest = max(by_round)
    with open(by_round[latest]) as f:
        return latest, json.load(f)


def test_window_is_exactly_the_driver_cap():
    qs = all_queries()
    oracle = [n for n, q in qs.items() if q.oracle is not None]
    window = [n for n in oracle if n not in _DEMOTED]
    assert len(window) == 50, (len(window), sorted(window))
    unknown = set(_DEMOTED) - set(oracle)
    assert not unknown, f"_DEMOTED names unknown/rows-only entries: {unknown}"


def test_every_demoted_entry_is_green_in_latest_driver_record():
    rnd, record = _latest_correctness()
    stale = []
    for name in _DEMOTED:
        row = record.get(name)
        green = bool(
            row
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match", True)
            and not row.get("err")
        )
        if not green:
            stale.append(name)
    assert not stale, (
        f"demoted entries without a green row in CORRECTNESS_r{rnd:02d} "
        f"(their attestation would be >1 round old after the next run): "
        f"{stale}"
    )
