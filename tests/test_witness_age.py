"""Machine-checkable witness-age bound (VERDICT r14 #3).

The driver re-checks the first 50 registry entries per round; with 223
entries the steady-state maximum witness age under perfect rotation is
ceil(223/50) = 5 rounds. This test enforces that bound from the
computed ledger (tools/witness_ledger.py over CORRECTNESS_r*.json)
instead of the hand-maintained rotation NOTE the r14 verdict retired:

- every registry entry has a green driver witness and none is failing
  at its most recent check;
- every entry whose witness would exceed the age bound once the
  UPCOMING round's window lands is queued inside that window
  (_CHECK_FIRST's first 50 positions);
- the window itself is well-formed (<= 50 names, all registered, no
  duplicates) so "queued" actually means "will be checked".
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

MAX_AGE = 5
WINDOW = 50


def _load():
    import witness_ledger
    from extract_permits_spark.plans import analytics

    return witness_ledger, analytics


def test_every_entry_has_green_witness():
    wl, analytics = _load()
    led = wl.ledger()
    registry = set(analytics._QUERIES)
    # an entry added THIS round legitimately has no witness yet — but
    # only if it is queued in the upcoming window (else it would stay
    # unchecked forever)
    window = set(analytics._CHECK_FIRST[:WINDOW])
    never = sorted(registry - set(led) - window)
    assert never == [], (
        f"registry entries never driver-checked and not queued: {never}"
    )
    failing = sorted(
        k for k in registry if led[k]["round"] == 0 or led[k]["ever_failed_after"]
    )
    assert failing == [], f"entries failing at their latest driver check: {failing}"


def test_stale_entries_are_queued_in_window():
    """An entry with last green witness <= latest-MAX_AGE would exceed
    the bound when the upcoming round's CORRECTNESS lands unless it is
    inside the window the driver will check."""
    wl, analytics = _load()
    led = wl.ledger()
    latest = wl.latest_round()
    window = analytics._CHECK_FIRST[:WINDOW]
    stale = sorted(
        k
        for k in analytics._QUERIES
        if k in led and led[k]["round"] <= latest - MAX_AGE
    )
    missing = sorted(set(stale) - set(window))
    assert missing == [], (
        f"entries whose witness would age past {MAX_AGE} rounds at "
        f"r{latest + 1} are not in _CHECK_FIRST[:{WINDOW}]: {missing}"
    )


def test_window_well_formed():
    wl, analytics = _load()
    window = analytics._CHECK_FIRST
    assert len(window) <= WINDOW, (
        f"_CHECK_FIRST has {len(window)} names; the driver only checks "
        f"{WINDOW} — trailing entries would silently never be witnessed"
    )
    assert len(set(window)) == len(window), "duplicate names in _CHECK_FIRST"
    unknown = sorted(set(window) - set(analytics._QUERIES))
    assert unknown == [], f"_CHECK_FIRST names not in the registry: {unknown}"


def test_ledger_has_no_orphans():
    """A green ledger entry missing from the registry means a query was
    deleted or renamed without cleaning up — the window math would
    silently count a ghost."""
    wl, analytics = _load()
    led = wl.ledger()
    orphans = sorted(set(led) - set(analytics._QUERIES))
    assert orphans == [], f"ledger entries absent from the registry: {orphans}"
