"""Driver-window rotation discipline (VERDICT r11 #2 / r14 Next #2).

The driver records only the FIRST 50 `queries()` entries per round, so
the sweep order IS the rotation policy: stale-first cohort, then
never-driver-seen entries, then this round's touched compile paths,
then everything else oldest-first. Round 14 cleared its window without
a spill, so round 15's seed is simply the r11 cohort — the 32 entries
whose newest driver row is r11, the oldest anywhere after r14's
histogram (r11:32 / r12:44 / r13:46 / r14:50). These tests pin the r15
composition mechanically so a silent mis-ordering (an entry waiting two
extra rounds unnoticed) cannot ship.
"""

from __future__ import annotations

import warnings

from skywalking_banyandb_spark import registry as reg


def _front():
    stale = [k for k in reg._R15_STALE_FIRST if k in reg._QUERIES]
    fresh = [k for k in reg._QUERIES
             if reg._newest_driver_round(k) == 0 and k not in stale]
    touched = [k for k in reg._R15_TOUCHED
               if k in reg._QUERIES and k not in fresh and k not in stale]
    return stale + fresh + touched


def test_r11_cohort_leads_the_window():
    """The r15 seed is the full r11 cohort: every _R15_STALE_FIRST entry
    must actually have its newest driver row at r11 (seeding anything
    fresher would waste window slots; anything staler cannot exist
    after r14's histogram), and the sweep leads with exactly that tuple."""
    order = list(reg.queries())
    stale = [k for k in reg._R15_STALE_FIRST if k in reg._QUERIES]
    assert order[:len(stale)] == stale
    for k in stale:
        assert reg._newest_driver_round(k) == 11, (
            f"{k} has newest driver row r{reg._newest_driver_round(k)}, "
            "not r11 — the seed no longer matches the staleness histogram")


def test_every_r11_row_is_in_the_seed():
    """No r11-stale entry may be left out of the seed — it would wait
    behind fresher rows and silently fall past the cap."""
    missing = [k for k in reg._QUERIES
               if reg._newest_driver_round(k) == 11
               and k not in reg._R15_STALE_FIRST]
    assert not missing, f"r11-stale entries outside the seed: {missing}"


def test_window_composition():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        order = list(reg.queries())
    front = _front()
    assert order[:len(front)] == front
    spill = front[reg._SWEEP_CAP:]
    if spill:
        # overflow rule: the warning must name the spilled entries and
        # each must have a driver row fresh enough to wait one round
        assert all(reg._newest_driver_round(k) >= 12 for k in spill)
        msgs = [str(x.message) for x in w if "exceeds" in str(x.message)]
        assert msgs and all(k in msgs[0] for k in spill)
    else:
        assert not [x for x in w if "exceeds" in str(x.message)]


def test_r15_front_fits_or_spill_is_documented():
    """32 stale + fresh + 6 touched; if it overflows, the spilled tail
    must be copied into the next round's seed — assert we can at least
    name it deterministically here."""
    stale = [k for k in reg._R15_STALE_FIRST if k in reg._QUERIES]
    assert len(stale) == 32  # the full r11 cohort


def test_nothing_outside_the_window_is_stale():
    """After the r15 sweep records the first 50, no entry's newest
    driver row anywhere in the registry may be older than r12 (the r11
    cohort all sits inside the window)."""
    order = list(reg.queries())
    for k in order[reg._SWEEP_CAP:]:
        assert reg._newest_driver_round(k) >= 12, (
            f"{k} (newest driver row r{reg._newest_driver_round(k)}) "
            "is outside the 50-entry window — it would go stale silently")


def test_r14_seen_set_matches_correctness_file():
    """_R14_DRIVER_SEEN must equal the keys of CORRECTNESS_r14.json —
    the bookkeeping the staleness ordering rests on."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..",
                        "CORRECTNESS_r14.json")
    recorded = frozenset(json.load(open(path)).keys())
    assert reg._R14_DRIVER_SEEN == recorded


def test_r13_seen_set_matches_correctness_file():
    """_R13_DRIVER_SEEN must equal the keys of CORRECTNESS_r13.json —
    the bookkeeping the staleness ordering rests on."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..",
                        "CORRECTNESS_r13.json")
    recorded = frozenset(json.load(open(path)).keys())
    assert reg._R13_DRIVER_SEEN == recorded


def test_oracles_and_queries_share_the_exact_order():
    assert list(reg.queries()) == list(reg.oracle_sql())
