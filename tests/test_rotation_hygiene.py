"""Rotation-window hygiene: the driver verifies the first 50 registry
entries per round, so the registry schedules which entries sit in that
window. Since round 9 the window is COMPUTED stalest-first from the
committed CORRECTNESS_r*.json artifacts (queries/__init__.py —
``stalest_window``), replacing the hand-maintained ledger of rounds 1-8;
since round 10 the rows-only entries (no DuckDB oracle) participate in
the rotation too, aged by their last rows-recorded driver row, so every
registry entry — not just oracle-checkable ones — is attested within the
capacity bound. These tests audit the scheduler against the actual driver
artifacts, not comments, so an arithmetic slip fails at commit time
instead of at judging:

- the window is exactly the driver cap;
- the window is stalest-first (no demoted entry is staler than any window
  entry — never-attested entries enter immediately, fair round-robin);
- every demoted entry's attestation is within the capacity bound
  ceil(N_total / 50) rounds — the strongest freshness any schedule can
  guarantee under the cap.
"""

from __future__ import annotations

import glob
import math
import os
import re

import synth_timeseries_data_spark.queries as Q

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rounds_desc() -> list[int]:
    paths = glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
    assert paths, "no driver CORRECTNESS records found"
    return sorted(
        (int(re.search(r"_r(\d+)\.json$", p).group(1)) for p in paths),
        reverse=True,
    )


def _staleness() -> dict[str, int]:
    """Per-entry staleness exactly as the scheduler computes it."""
    qs = Q.all_queries()
    green = Q.last_green_rounds()
    ran = Q.last_rowsonly_rounds()
    return {
        n: (green if q.oracle is not None else ran).get(n, -1)
        for n, q in qs.items()
    }


def _parts():
    qs = Q.all_queries()  # populates Q._DEMOTED
    window = [n for n in qs if n not in Q._DEMOTED]
    return qs, window, set(Q._DEMOTED)


def test_window_is_exactly_the_driver_cap():
    qs, window, demoted = _parts()
    assert len(window) == Q._DRIVER_CAP, (len(window), sorted(window))
    # ordering contract: the driver checks the FIRST 50 entries — those
    # must be exactly the window.
    assert set(list(qs)[: Q._DRIVER_CAP]) == set(window)
    unknown = demoted - set(qs)
    assert not unknown, f"demoted names unknown: {unknown}"


def test_window_is_stalest_first():
    qs, window, demoted = _parts()
    last = _staleness()
    key = lambda n: (last[n], n)  # noqa: E731
    worst_window = max(key(n) for n in window)
    best_demoted = min(key(n) for n in demoted)
    assert worst_window <= best_demoted, (
        f"window holds {worst_window} while staler {best_demoted} is "
        f"demoted — scheduler is not stalest-first"
    )
    never = [n for n in qs if last[n] == -1]
    overflow = [n for n in never if n not in window]
    assert len(never) > Q._DRIVER_CAP or not overflow, (
        f"never-attested entries left out of a non-full window: {overflow}"
    )


def test_every_demoted_entry_is_attested_within_capacity_bound():
    qs, _, demoted = _parts()
    bound = math.ceil(len(qs) / Q._DRIVER_CAP)
    rounds = _rounds_desc()[:bound]
    last = _staleness()
    stale = [n for n in demoted if last[n] not in rounds]
    assert not stale, (
        f"demoted entries with no driver record in the last {bound} driver "
        f"records (rounds {rounds}): {stale}"
    )


def test_no_entry_has_zero_lifetime_driver_records_once_windowed():
    """Every registry entry either has SOME lifetime driver record or sits
    in the current window (so it gets one this round) — the r9 verdict's
    'never attested, never scheduled' hole is structurally closed."""
    qs, window, _ = _parts()
    last = _staleness()
    orphans = [n for n in qs if last[n] == -1 and n not in window]
    assert not orphans, orphans


# ---------------------------------------------------------------------------
# Scheduler properties on SYNTHETIC histories: the tests above audit the
# real artifacts; these simulate the driver loop itself so the fairness
# claim ("every entry re-attests within ceil(N/50) rounds, failures
# retry immediately") is pinned as an algorithm property, not just an
# observation of the current repo state.
# ---------------------------------------------------------------------------


def _simulate(n_entries, n_rounds, fail=None, cap=None):
    """Run the stalest-first rule over a synthetic driver history.

    Returns {name: last_green_round} after n_rounds. ``fail(name, round)``
    marks an in-window check as failed (no green row)."""
    cap = cap or Q._DRIVER_CAP
    names = [f"q{i:03d}" for i in range(n_entries)]
    last = {}
    history = []
    for rnd in range(1, n_rounds + 1):
        ranked = sorted(names, key=lambda n: (last.get(n, -1), n))
        window = ranked[:cap]
        for n in window:
            if fail and fail(n, rnd):
                continue
            last[n] = rnd
        history.append((rnd, set(window)))
    return last, history


def test_simulated_fairness_bound_holds():
    for n_entries in (40, 50, 100, 113, 120, 128, 137, 251):
        bound = math.ceil(n_entries / Q._DRIVER_CAP)
        last, _ = _simulate(n_entries, n_rounds=12)
        final = 12
        stale = {
            n: final - r for n, r in last.items() if final - r >= bound
        }
        assert not stale, (n_entries, bound, stale)
        assert len(last) == n_entries  # everyone attested at least once


def test_simulated_failed_entry_retries_next_round():
    # q007 fails at rounds 1-3, then recovers: it must sit in EVERY window
    # until it finally goes green (stalest-first keeps retrying it).
    last, history = _simulate(
        120, n_rounds=6, fail=lambda n, r: n == "q007" and r <= 3
    )
    for rnd, window in history[:4]:
        assert "q007" in window, (rnd, "failed entry left the window")
    # green at round 4 -> freshest, so round 5's window rotates it out
    # (it may legitimately re-enter later through normal rotation)
    assert "q007" not in history[4][1]


def test_simulated_new_entry_enters_immediately():
    # entries appearing mid-history (never attested) outrank everything
    names120 = [f"q{i:03d}" for i in range(120)]
    last, _ = _simulate(120, n_rounds=3)
    ranked = sorted(
        names120 + ["zz_new"], key=lambda n: (last.get(n, -1), n)
    )
    assert ranked[0] == "zz_new"
