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
    import json

    from visual_asset_management_system_spark.queries import QUERIES

    with open("/root/repo/QUERY_HASHES.json") as f:
        snapshot = json.load(f)
    latest = e._latest_rows()
    green = {n: r for n, (r, ok) in latest.items() if ok}
    import hashlib
    import inspect

    from visual_asset_management_system_spark.queries import ORACLES

    drifted = []
    for name in green:
        if name not in snapshot or name not in QUERIES:
            continue
        snap = snapshot[name]
        src_fp = hashlib.md5(
            (
                inspect.getsource(QUERIES[name])
                + "\n--oracle--\n"
                + ORACLES.get(name, "")
            ).encode()
        ).hexdigest()
        if isinstance(snap, str):  # legacy entry: src+oracle hash only
            if src_fp != snap:
                drifted.append(name)
        elif src_fp != snap.get("src") or e._query_fingerprint(name) != snap.get(
            "full"
        ):
            drifted.append(name)
    flagged = set(e._auto_recheck(green)) | set(e._RECHECK_OVERRIDES)
    missing = [n for n in drifted if n not in flagged]
    assert not missing, (
        f"{len(missing)} drifted green names invisible to the recheck "
        f"machinery: {missing[:5]}"
    )
    # capacity permitting, drift must actually reach the gate window.
    # Capacity includes the manual _RECHECK_OVERRIDES: pins are
    # deliberate recheck names with documented precedence (this-round
    # algorithmic edits whose class-2 rows would sort behind the
    # backfill), so a pin legitimately displaces a fingerprint-drifted
    # backfill name when the window is full — what must never happen
    # is drift invisible to the machinery (asserted above).
    order = e._driver_order(list(QUERIES))
    never = [n for n in QUERIES if n not in green]
    pinned_extra = [
        n for n in e._RECHECK_OVERRIDES
        if n in green and n not in drifted and n not in never
    ]
    if len(never) + len(drifted) + len(pinned_extra) <= e._GATE_WINDOW:
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


def test_fingerprint_definitions_agree():
    """__spark_entry__._query_fingerprint and the _FP_SNIPPET embedded
    in scripts/update_query_hashes.py are two implementations of ONE
    blob definition (the snippet must be self-contained because it runs
    inside historical gate worktrees). If they drift, every name
    'drifts' forever or staleness is silently erased — so pin exact
    agreement on the current tree."""
    import json
    import subprocess
    import sys as _sys

    _sys.path.insert(0, "/root/repo/scripts")
    from update_query_hashes import _FP_SNIPPET

    proc = subprocess.run(
        [_sys.executable, "-c", _FP_SNIPPET, "/root/repo"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    snippet_fp = json.loads(proc.stdout.strip().splitlines()[-1])
    from visual_asset_management_system_spark.queries import QUERIES

    mismatched = [
        n
        for n in QUERIES
        if (snippet_fp.get(n) or {}).get("full") != e._query_fingerprint(n)
    ]
    assert not mismatched, (
        f"fingerprint definitions drifted for {len(mismatched)} names: "
        f"{mismatched[:5]}"
    )


def test_fingerprint_covers_referenced_helpers(monkeypatch):
    """The blob must include transitively-referenced queries.py-local
    helpers: an edit to a shared helper (the r10 `_kmv_segment_cache`
    cache-key fix) changes behavior without touching the query's own
    source, and the old src+oracle blob missed it."""
    helper_src, helper_refs = e._helper_table()
    victim_helper = "tables"  # every query references the table loader
    assert victim_helper in helper_src
    before = e._query_fingerprint("q01_pricing_summary")
    edited = dict(helper_src)
    edited[victim_helper] = helper_src[victim_helper] + "\n# edited"
    monkeypatch.setattr(e, "_HELPER_TABLE", (edited, helper_refs))
    after = e._query_fingerprint("q01_pricing_summary")
    assert before != after


def test_changed_symbols_prunes_untouched_functions(tmp_path):
    """Symbol-level staleness (VERDICT r10 'What's missing' #1): a
    module edit must only flag queries referencing the CHANGED symbols
    — r10's descendants() rewrite marked all 11 graph.py importers
    stale and pushed 4 oldest r6 greens out of the 50-wide window.
    Pins: direct change detected, intra-module transitive closure
    (caller of a changed helper counts changed), untouched symbols
    pruned, preamble change -> None (all stale)."""
    import subprocess

    repo = tmp_path / "r"
    repo.mkdir()
    sub = repo / "pkg"
    sub.mkdir()
    v1 = (
        "X = 1\n\n"
        "def _helper():\n    return X\n\n"
        "def caller():\n    return _helper()\n\n"
        "def untouched():\n    return 42\n"
    )
    (sub / "m.py").write_text(v1)
    env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
           "PATH": "/usr/bin:/bin"}
    for cmd in (["git", "init", "-q"], ["git", "add", "."],
                ["git", "commit", "-qm", "v1"]):
        subprocess.run(cmd, cwd=repo, check=True, env=env)
    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=repo, capture_output=True,
        text=True, env=env,
    ).stdout.strip()

    # edit only _helper -> closure flags _helper AND caller, not untouched
    (sub / "m.py").write_text(v1.replace("return X", "return X + 1"))
    e._SYMDIFF_CACHE.clear()
    changed = e._changed_symbols(sha, "pkg/m.py", str(repo))
    assert changed == {"_helper", "caller"}

    # preamble (module constant) change -> None: every importer stale
    (sub / "m.py").write_text(v1.replace("X = 1", "X = 2"))
    e._SYMDIFF_CACHE.clear()
    assert e._changed_symbols(sha, "pkg/m.py", str(repo)) is None

    # no change at all -> empty set
    (sub / "m.py").write_text(v1)
    e._SYMDIFF_CACHE.clear()
    assert e._changed_symbols(sha, "pkg/m.py", str(repo)) == set()
    e._SYMDIFF_CACHE.clear()


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
