"""Window-rotation ledger: per-entry driver-check staleness, automated.

The driver's correctness gate checks the first ~50 registry entries per
round (`contracts._CHECK_WINDOW`); the rotation promise is that nothing
goes stale for many rounds and every new entry ships with a slot.
Rounds 9 and 10 did this accounting by hand in comments — this tool
derives it from the CORRECTNESS_r*.json records themselves:

- last GREEN driver round per registry entry (cumulative across rounds);
- entries never driver-checked (must be this round's NEW entries, which
  the current window must contain);
- a proposed next window: new/never-checked entries first, then by
  staleness (oldest last-green round first), capped at the window size.

Usage: python tools/window_rotation.py [--propose]
Exit 1 if a never-checked entry is missing from the CURRENT window
(a new entry shipped without a slot) — the regression the rotation
rule exists to prevent.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50


def last_green_rounds() -> dict[str, int]:
    out: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rec = json.load(open(f))
        except (OSError, json.JSONDecodeError):
            continue
        for name, res in rec.items():
            if isinstance(res, dict) and res.get("rows_match") and not res.get("err"):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> int:
    from changedatacapture_reporting_spark.contracts import (
        _CHECK_WINDOW,
        _REGISTRY_ALL,
    )

    greens = last_green_rounds()
    never = [n for n in _REGISTRY_ALL if n not in greens]
    by_staleness = sorted(
        (n for n in _REGISTRY_ALL if n in greens),
        key=lambda n: (greens[n], n),
    )

    print(f"registry entries: {len(_REGISTRY_ALL)}; window: {len(_CHECK_WINDOW)}")
    print(f"never driver-checked ({len(never)}): {never}")
    missing_slot = [n for n in never if n not in _CHECK_WINDOW]
    buckets: dict[int, int] = {}
    for n in by_staleness:
        buckets[greens[n]] = buckets.get(greens[n], 0) + 1
    print("last-green round histogram:", dict(sorted(buckets.items())))
    stalest = by_staleness[:15]
    print("15 stalest:", [(n, greens[n]) for n in stalest])

    if "--propose" in sys.argv:
        proposal = list(never)
        for n in by_staleness:
            if len(proposal) >= WINDOW_SIZE:
                break
            if n not in proposal:
                proposal.append(n)
        print("\nproposed next window (new + stalest-first):")
        for n in proposal:
            print(f'    "{n}",')

    if missing_slot:
        print(
            f"\nFAIL: new entries without a current-window slot: "
            f"{missing_slot}"
        )
        return 1
    print("\nOK: every never-checked entry holds a current-window slot")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
