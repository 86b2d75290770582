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


def test_fingerprint_drift_is_flagged_stale():
    """QUERY_HASHES.json holds the fingerprint each name's latest GREEN
    gate ran (reconstructed from gate commits by scripts/
    update_query_hashes.py — NOT a blanket capture of the working
    tree, which would erase in-round-rewrite staleness; VERDICT r7
    finding #1). The live invariant: every green name whose current
    source/oracle fingerprint drifted from the snapshot must be flagged
    by _auto_recheck, and (capacity permitting) land inside the gate
    window."""
    import hashlib
    import inspect
    import json

    from visual_asset_management_system_spark.queries import ORACLES, QUERIES

    with open("/root/repo/QUERY_HASHES.json") as f:
        snapshot = json.load(f)
    latest = e._latest_rows()
    green = {n: r for n, (r, ok) in latest.items() if ok}
    drifted = []
    for name in green:
        if name not in snapshot or name not in QUERIES:
            continue
        blob = (
            inspect.getsource(QUERIES[name])
            + "\n--oracle--\n"
            + ORACLES.get(name, "")
        )
        if hashlib.md5(blob.encode()).hexdigest() != snapshot[name]:
            drifted.append(name)
    flagged = set(e._auto_recheck(green)) | set(e._RECHECK_OVERRIDES)
    missing = [n for n in drifted if n not in flagged]
    assert not missing, (
        f"{len(missing)} drifted green names invisible to the recheck "
        f"machinery: {missing[:5]}"
    )
    # capacity permitting, drift must actually reach the gate window
    order = e._driver_order(list(QUERIES))
    never = [n for n in QUERIES if n not in green]
    if len(never) + len(drifted) <= e._GATE_WINDOW:
        window = set(order[: e._GATE_WINDOW])
        out = [n for n in drifted if n not in window]
        assert not out, f"drifted names pushed out of the window: {out[:5]}"


def test_simulated_local_rewrite_marks_stale(monkeypatch):
    """A queries.py-LOCAL edit (no engine-module commit for git
    attribution to see) after the snapshot was built must still mark
    the query stale: swap a green name's function for one with
    different source and assert _auto_recheck flags it."""
    import json

    with open("/root/repo/QUERY_HASHES.json") as f:
        snapshot = json.load(f)
    latest = e._latest_rows()
    green = {n: r for n, (r, ok) in latest.items() if ok and n in snapshot}
    assert green, "no green snapshot names — repo state broken"
    victim = sorted(green)[0]

    def rewritten(spark, sf_dir):  # different source text, same shape
        return None

    monkeypatch.setitem(e.QUERIES, victim, rewritten)
    assert victim in e._auto_recheck({victim: green[victim]})


def test_reconstruct_keeps_old_entry_when_history_unavailable():
    """Pure-merge contract of the snapshot builder: a green name takes
    its gate round's historical fingerprint; if that round could not be
    fingerprinted the PRIOR entry is kept (never the current working
    tree's hash — that is exactly the staleness-erasing bug); names
    with no green row are dropped."""
    sys.path.insert(0, "/root/repo/scripts")
    from update_query_hashes import reconstruct

    green = {"qa": 5, "qb": 5, "qc": 6}
    fp_at = {5: {"qa": "h5a", "qb": "h5b"}}  # round 6 unavailable
    old = {"qc": "old_c", "qd": "old_d", "qa": "stale_a"}
    out = reconstruct(green, fp_at, old)
    assert out == {"qa": "h5a", "qb": "h5b", "qc": "old_c"}
