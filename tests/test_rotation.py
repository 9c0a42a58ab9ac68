"""Pins the transitive rotation rule (VERDICT r13 #1): every registry
entry the rotation audit flags as changed since the round's base ref —
minus the round's documented hygiene modules — must be queued in
_CHECK_FIRST, so a helper or chunk edit can never silently dodge its
driver re-witness. Complements test_harness_contracts (window names
exist, order is honored) — this one closes the loop on window CONTENT.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _ref_resolves(ref: str) -> bool:
    return (
        subprocess.run(
            ["git", "rev-parse", "--verify", f"{ref}^{{commit}}"],
            cwd=REPO, capture_output=True,
        ).returncode
        == 0
    )


def test_check_first_covers_rotation_audit():
    import rotation_audit
    from extract_permits_spark.plans import analytics

    if not _ref_resolves(analytics._AUDIT_BASE):
        pytest.skip("audit base commit not present in this clone")
    flagged = rotation_audit.affected_entries(
        analytics._AUDIT_BASE, analytics._AUDIT_HYGIENE_MODULES
    )
    missing = sorted(set(flagged) - set(analytics._CHECK_FIRST))
    assert missing == [], (
        "entries changed since the round's audit base are not queued in "
        f"_CHECK_FIRST: { {m: flagged[m] for m in missing} } — add them "
        "to the window (or, if the edit is value-neutral hygiene, add "
        "its MODULE to _AUDIT_HYGIENE_MODULES with a justification)"
    )


def test_hygiene_exemptions_name_real_modules():
    """A typo'd exemption would silently exempt nothing — fail loudly."""
    import rotation_audit
    from extract_permits_spark.plans import analytics

    mods = set(rotation_audit.engine_modules())
    bogus = sorted(set(analytics._AUDIT_HYGIENE_MODULES) - mods)
    assert bogus == [], f"exempt names are not engine modules: {bogus}"


def test_audit_base_is_full_sha():
    """A branch name or short sha would drift; pin the full 40-char sha
    so the audited diff is the same on every machine."""
    from extract_permits_spark.plans import analytics

    assert len(analytics._AUDIT_BASE) == 40
    assert all(c in "0123456789abcdef" for c in analytics._AUDIT_BASE)


def test_chunk_granularity_drops_untouched_entries():
    """The r14 body-granular rule: an edit inside one chunk entry must
    not flag the chunk's unrelated entries (the pre-r14 behavior flagged
    all ~70). Uses the round's real diff when present; vacuous (skipped)
    on a clean tree at the base ref."""
    import rotation_audit
    from extract_permits_spark.plans import analytics

    if not _ref_resolves(analytics._AUDIT_BASE):
        pytest.skip("audit base commit not present in this clone")
    flagged = rotation_audit.affected_entries(
        analytics._AUDIT_BASE, analytics._AUDIT_HYGIENE_MODULES
    )
    chunk_flagged = [
        e for e, mods in flagged.items()
        if any(m.rsplit(".", 1)[-1].startswith("analytics") for m in mods)
    ]
    if not chunk_flagged:
        pytest.skip("no chunk modules changed since the audit base")
    # strictly fewer than a whole chunk's membership (~55+ entries each)
    assert len(chunk_flagged) < 40, (
        "chunk edits are flagging near-whole-chunk memberships again: "
        f"{sorted(chunk_flagged)[:50]}"
    )
