"""Machine-readable driver-witness ledger (VERDICT r14 #3).

Folds every ``CORRECTNESS_r*.json`` at the repo root into

    {entry: {"round": last_green_round, "ever_failed_after": bool}}

where ``round`` is the LATEST round whose driver check recorded the
entry fully green (rows + schema + hash where present, rows otherwise).
This replaces the hand-maintained rotation NOTE arithmetic in
plans/analytics.py (it needed a fix commit in r14, e9f7e7c) with a
computed artifact: tests/test_witness_age.py asserts from this ledger
that (a) every registry entry has a green witness, (b) no entry's
witness would age past the steady-state bound of a 50-slot window over
the registry UNLESS it is queued in the upcoming round's window
(_CHECK_FIRST), and (c) nothing green-listed here is absent from the
registry (a deleted entry must leave the window too).

Usage:
    python tools/witness_ledger.py            # table, oldest first
    python tools/witness_ledger.py --json     # the raw ledger

Library surface: ledger() -> dict, latest_round() -> int.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_green(rec: dict) -> bool:
    """Green = no error and every *_match the driver recorded is true.

    Entries without an oracle get the weaker rows-only record; the
    driver still writes rows_match for them, so the same rule holds.
    """
    if rec.get("err"):
        return False
    matches = [v for k, v in rec.items() if k.endswith("_match")]
    return bool(matches) and all(v is True for v in matches)


def ledger() -> dict[str, dict]:
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            cur = out.setdefault(
                name, {"round": 0, "ever_failed_after": False}
            )
            if _entry_green(rec):
                if rnd >= cur["round"]:
                    cur["round"] = rnd
                    cur["ever_failed_after"] = False
            elif rnd > cur["round"]:
                # a non-green check NEWER than the last green witness:
                # the entry is currently failing at the driver
                cur["ever_failed_after"] = True
    return out


def latest_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds) if rounds else 0


def main() -> int:
    led = ledger()
    if "--json" in sys.argv:
        print(json.dumps(led, indent=1, sort_keys=True))
        return 0
    cur = latest_round()
    rows = sorted(led.items(), key=lambda kv: (kv[1]["round"], kv[0]))
    print(f"{len(rows)} entries; latest driver round r{cur}")
    for name, rec in rows:
        age = cur - rec["round"]
        flag = "  FAILING" if rec["ever_failed_after"] else ""
        print(f"r{rec['round']:02d} (age {age}) {name}{flag}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:
        # piped into head/grep — normal, not an error
        sys.exit(0)
