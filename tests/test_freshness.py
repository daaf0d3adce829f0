"""Machine-checked freshness invariant (VERDICT r12 ask #5).

The driver samples the first 50 registry entries per round; the builder
rotates `_SAMPLE_PRIORITY` so every entry re-earns a green row within a
bounded number of rounds, new entries get verified immediately, and
expression-touched entries re-verify the same round. Through round 12
this was comment discipline; these tests enforce it against the
committed CORRECTNESS_r*.json ledger, with the window rule defined ONCE
in tools/coverage_report.staged_window.
"""

from __future__ import annotations

import math


def _ledger():
    from tools.coverage_report import last_green_rounds

    return last_green_rounds()


def test_sample_window_matches_staging_rule():
    """_SAMPLE_PRIORITY must be exactly what the rule derives: new
    entries + declared re-verifications + stalest fill. Hand-editing the
    window without restaging (or forgetting to declare a changed-code
    re-verification in _REVERIFY_HEAD) fails here."""
    from flink_gmall_spark.registry import (
        _REGISTRATION_ORDER,
        _REVERIFY_HEAD,
        _SAMPLE_PRIORITY,
    )
    from tools.coverage_report import staged_window

    want = staged_window(_REGISTRATION_ORDER, _ledger(), _REVERIFY_HEAD)
    assert len(_SAMPLE_PRIORITY) == len(want) == 50
    # sets, not sequence: order within the window is presentation; the
    # driver samples all 50 regardless
    assert set(_SAMPLE_PRIORITY) == set(want), (
        sorted(set(want) - set(_SAMPLE_PRIORITY)),
        sorted(set(_SAMPLE_PRIORITY) - set(want)),
    )


def test_every_entry_green_or_staged():
    """No entry may be neither ever-green nor scheduled: an entry
    without a green driver row in any CORRECTNESS_r*.json must be in
    the staged window (it is new) — otherwise it is silently
    unverified surface."""
    from flink_gmall_spark.registry import _SAMPLE_PRIORITY, registry

    last = _ledger()
    orphans = [
        n for n in registry() if n not in last and n not in _SAMPLE_PRIORITY
    ]
    assert not orphans, orphans


def test_freshness_debt_bounded_outside_window():
    """Entries NOT in the current window must not be staler than one
    full rotation: with N entries and 50 slots a complete pass takes
    ceil(N/50) rounds, so anything older than max_round − (ceil(N/50)+1)
    outside the window means the rotation skipped it."""
    from flink_gmall_spark.registry import _SAMPLE_PRIORITY, registry

    last = _ledger()
    max_round = max(last.values())
    lag = math.ceil(len(registry()) / 50) + 1
    stale = [
        (n, last[n])
        for n in registry()
        if n in last
        and n not in _SAMPLE_PRIORITY
        and last[n] < max_round - lag
    ]
    assert not stale, stale
