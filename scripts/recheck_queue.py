"""Print the verification-freshness queue the way a round start needs
it: spent pins to prune, stale-green composition, window occupancy,
and the post-gate residue estimate.

Usage (read-only; run after any CORRECTNESS_r*.json lands and again
after `python scripts/update_query_hashes.py`):

    python scripts/recheck_queue.py

The round-start ritual this summarizes (see VERDICT round notes):
1. prune `_RECHECK_OVERRIDES` entries that are driver-green in the
   latest CORRECTNESS file (printed below as SPENT);
2. run `python scripts/update_query_hashes.py` (reconstructs each
   green name's fingerprint from its gate commit — never hand-edit);
3. re-run this script — the queue shrinks to genuine staleness.
"""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as e  # noqa: E402


def main() -> None:
    latest = e._latest_rows()
    green = {n: r for n, (r, ok) in latest.items() if ok}
    red = sorted(n for n, (_r, ok) in latest.items() if not ok)
    names = list(e.queries())
    never = [n for n in names if n not in latest]
    stale = e._auto_recheck(green)
    window = names[: e._GATE_WINDOW]
    wset = set(window)

    # skip non-numeric suffixes (e.g. a stray CORRECTNESS_rtest.json)
    # instead of AttributeError-ing the round-start ritual
    rounds = sorted(
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"r(\d+)", os.path.basename(p)))
    )
    last_round = rounds[-1] if rounds else None
    # a pin is SPENT when its latest row is green in the newest gate
    # AND nothing has re-staled it since (a pin added mid-round for an
    # in-round edit is green in the previous gate yet NOT spent — the
    # edit it pins against is exactly what the stale queue shows)
    spent = [
        n for n in e._RECHECK_OVERRIDES
        if green.get(n) == last_round and n not in set(stale)
    ]

    print(f"registered: {len(names)}  green: {len(green)}  "
          f"red: {len(red)}  never-checked: {len(never)}")
    if red:
        print(f"RED (latest row failed): {red}")
    if never:
        print(f"never-checked (window-first): {never}")
    print(f"overrides: {len(e._RECHECK_OVERRIDES)} "
          f"({e._RECHECK_OVERRIDES})")
    if spent:
        print(f"SPENT pins (green in r{last_round} — prune them): {spent}")
    print(f"stale queue: {len(stale)}")
    freshness: dict[int, int] = {}
    for n in green:
        freshness[green[n]] = freshness.get(green[n], 0) + 1
    print("green freshness by round:",
          dict(sorted(freshness.items())))
    in_window = [n for n in stale if n in wset]
    out_window = [n for n in stale if n not in wset]
    print(f"window occupancy: {len(in_window)} stale + "
          f"{len(never)} never + "
          f"{e._GATE_WINDOW - len(in_window) - len(never)} refresh slots")
    print(f"post-gate residue estimate: {len(out_window)} "
          f"(stale names outside the window)")
    if out_window:
        print(f"  residue: {out_window}")


if __name__ == "__main__":
    main()
