"""Contract tests for __spark_entry__'s verification-priority ordering
(the driver's oracle gate checks only the first _GATE_WINDOW entries)."""

from __future__ import annotations

import importlib
import sys

sys.path.insert(0, "/root/repo")
e = importlib.import_module("__spark_entry__")


def test_never_checked_sort_first_and_window_caps(monkeypatch):
    names = [f"q{i}" for i in range(80)]
    green = {f"q{i}": 2 for i in range(10, 80)}  # q0..q9 never checked
    monkeypatch.setattr(
        e, "_latest_rows", lambda: {n: (r, True) for n, r in green.items()}
    )
    monkeypatch.setattr(e, "_auto_recheck", lambda g: [f"q{i}" for i in range(10, 75)])
    monkeypatch.setattr(e, "_RECHECK_OVERRIDES", ["q70"])
    order = e._driver_order(names)
    assert sorted(order) == sorted(names)  # permutation, nothing lost
    assert order[:10] == [f"q{i}" for i in range(10)]  # never first
    assert order[10] == "q70"  # manual override leads the recheck block
    # recheck capped so never + recheck fill exactly the gate window
    window = order[: e._GATE_WINDOW]
    assert len(window) == e._GATE_WINDOW


def test_red_latest_row_counts_as_never(monkeypatch):
    monkeypatch.setattr(
        e,
        "_latest_rows",
        lambda: {"qa": (3, False), "qb": (3, True)},
    )
    monkeypatch.setattr(e, "_auto_recheck", lambda g: [])
    monkeypatch.setattr(e, "_RECHECK_OVERRIDES", [])
    order = e._driver_order(["qa", "qb"])
    assert order == ["qa", "qb"]


def test_git_failure_degrades_gracefully(monkeypatch):
    monkeypatch.setattr(
        e, "_latest_rows", lambda: {"qb": (1, True)}
    )
    monkeypatch.setattr(e, "_RECHECK_OVERRIDES", [])

    def boom(green):
        raise AssertionError("must not be called through this path")

    # _auto_recheck itself returns [] on subprocess failure; simulate by
    # patching subprocess.run to raise inside the real function
    import subprocess

    def raise_oserror(*a, **k):
        raise OSError("no git")

    monkeypatch.setattr(subprocess, "run", raise_oserror)
    order = e._driver_order(["qa", "qb"])
    assert order == ["qa", "qb"]  # never-checked first, green last


def test_query_fingerprints_are_current():
    """QUERY_HASHES.json must match the code the gate will run — the
    recheck automation compares future rounds against this snapshot, so
    a stale snapshot silently mis-attributes staleness. Regenerate with
    `python scripts/update_query_hashes.py` after ANY query or oracle
    edit (it is the round's last step)."""
    import json

    sys.path.insert(0, "/root/repo/scripts")
    from update_query_hashes import fingerprints

    with open("/root/repo/QUERY_HASHES.json") as f:
        snapshot = json.load(f)
    current = fingerprints()
    changed = sorted(
        n for n in set(snapshot) | set(current)
        if snapshot.get(n) != current.get(n)
    )
    assert not changed, (
        f"{len(changed)} query fingerprints drifted from QUERY_HASHES.json "
        f"(first: {changed[:5]}) — run scripts/update_query_hashes.py"
    )
