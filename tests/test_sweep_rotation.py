"""Driver-window rotation discipline (VERDICT r11 #2 / r12 Next #1).

The driver records only the FIRST 50 `queries()` entries per round, so
the sweep order IS the rotation policy: stale-first cohort, then
never-driver-seen entries, then this round's touched compile paths,
then everything else oldest-first. Round 12's priority front exceeded
the cap for the first time and spilled (``request_yaml_topn``,
``bydbql_show_top``); the overflow rule (registry.py, above
``_R8_STALE_FIRST``) makes that spill the MANDATORY PREFIX of round
13's stale seed. These tests pin the r13 composition mechanically so a
silent mis-ordering (an entry waiting two extra rounds unnoticed)
cannot ship.
"""

from __future__ import annotations

import warnings

from skywalking_banyandb_spark import registry as reg


def _front():
    stale = [k for k in reg._R13_STALE_FIRST if k in reg._QUERIES]
    fresh = [k for k in reg._QUERIES
             if reg._newest_driver_round(k) == 0 and k not in stale]
    touched = [k for k in reg._R13_TOUCHED
               if k in reg._QUERIES and k not in fresh and k not in stale]
    return stale + fresh + touched


def test_mandatory_prefix_leads_the_window():
    """The r12 overflow spill must be positions 0 and 1 of the r13
    sweep, in the spill order the r12 warning named."""
    order = list(reg.queries())
    assert order[:2] == ["request_yaml_topn", "bydbql_show_top"]


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
        assert all(reg._newest_driver_round(k) >= 10 for k in spill)
        msgs = [str(x.message) for x in w if "exceeds" in str(x.message)]
        assert msgs and all(k in msgs[0] for k in spill)
    else:
        assert not [x for x in w if "exceeds" in str(x.message)]


def test_r13_front_fits_or_spill_is_documented():
    """39 stale + fresh + touched; if it overflows, the spilled tail
    must be copied into the next round's seed — assert we can at least
    name it deterministically here."""
    front = _front()
    stale = [k for k in reg._R13_STALE_FIRST if k in reg._QUERIES]
    assert len(stale) == 39  # 2 mandatory prefix + 37 r9 cohort


def test_nothing_outside_the_window_is_stale():
    """After the r13 sweep records the first 50, no entry's newest
    driver row anywhere in the registry may be older than r10 (the r9
    cohort and the spill prefix all sit inside the window)."""
    order = list(reg.queries())
    for k in order[reg._SWEEP_CAP:]:
        assert reg._newest_driver_round(k) >= 10, (
            f"{k} (newest driver row r{reg._newest_driver_round(k)}) "
            "is outside the 50-entry window — it would go stale silently")


def test_r12_seen_set_matches_correctness_file():
    """_R12_DRIVER_SEEN must equal the keys of CORRECTNESS_r12.json —
    the bookkeeping the staleness ordering rests on."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..",
                        "CORRECTNESS_r12.json")
    recorded = frozenset(json.load(open(path)).keys())
    assert reg._R12_DRIVER_SEEN == recorded


def test_oracles_and_queries_share_the_exact_order():
    assert list(reg.queries()) == list(reg.oracle_sql())
