"""Driver-window rotation discipline (VERDICT r11 #2 done-criterion).

The driver records only the FIRST 50 `queries()` entries per round, so
the sweep order IS the rotation policy: stale-first cohort, then
never-driver-seen entries, then this round's touched compile paths,
then everything else oldest-first. Round 12 is the first round whose
priority front exceeds the cap (39 stale + 3 fresh + 10 touched = 52);
the overflow rule (registry.py, above ``_R8_STALE_FIRST``) says the
spilled tail must be NAMED by the warning and become the mandatory
prefix of the next round's stale seed. These tests pin the composition
mechanically so a silent mis-ordering (an entry waiting two extra
rounds unnoticed) cannot ship.
"""

from __future__ import annotations

import warnings

from skywalking_banyandb_spark import registry as reg


def _front():
    stale = [k for k in reg._R8_STALE_FIRST if k in reg._QUERIES]
    fresh = [k for k in reg._QUERIES
             if reg._newest_driver_round(k) == 0 and k not in stale]
    touched = [k for k in reg._R12_TOUCHED
               if k in reg._QUERIES and k not in fresh and k not in stale]
    return stale + fresh + touched


def test_window_composition_and_documented_spill():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        order = list(reg.queries())
    front = _front()
    assert order[:len(front)] == front
    # the spill is exactly the entries the registry comment documents,
    # and their newest driver rows (r11) are fresh enough to wait a round
    spill = front[reg._SWEEP_CAP:]
    assert spill == ["request_yaml_topn", "bydbql_show_top"]
    assert all(reg._newest_driver_round(k) >= 9 for k in spill)
    msgs = [str(x.message) for x in w if "exceeds" in str(x.message)]
    assert msgs and all(k in msgs[0] for k in spill)


def test_nothing_outside_the_window_is_stale():
    """After the r12 sweep records the first 50, no entry's newest
    driver row anywhere in the registry may be older than r9: the whole
    r8 cohort sits inside the window, never-seen entries sit inside the
    window, and the one spill is r11-fresh."""
    order = list(reg.queries())
    for k in order[reg._SWEEP_CAP:]:
        assert reg._newest_driver_round(k) >= 9, (
            f"{k} (newest driver row r{reg._newest_driver_round(k)}) "
            "is outside the 50-entry window — it would go stale silently")


def test_oracles_and_queries_share_the_exact_order():
    assert list(reg.queries()) == list(reg.oracle_sql())
