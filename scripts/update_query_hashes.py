"""Reconstruct QUERY_HASHES.json: per-query fingerprints of the code
each query's LATEST GREEN correctness gate actually ran — recomputed
from git, so the snapshot is a pure function of (git history,
CORRECTNESS_r*.json) and can be regenerated at ANY point in a round
without erasing staleness. Each entry is {"src": md5(query source +
oracle SQL), "full": md5(the same + sources of every transitively
referenced queries.py top-level helper)} — `src` drift means a direct
edit (highest recheck priority), `full`-only drift means a shared
helper changed under an untouched query (the r10 `_kmv_segment_cache`
case). Legacy pre-r11 string entries are src-only hashes.

__spark_entry__._auto_recheck compares current fingerprints against
this snapshot: a driver-green name whose fingerprint changed since its
green gate needs a recheck — this catches queries.py-LOCAL changes
(shared helpers, inline rewrites) that git module-attribution can't
see.

Why reconstruction instead of a blanket capture (the round-7 verdict's
finding #1): a blanket regenerate at round end ERASES staleness for a
query rewritten in-round but NOT inside that round's 50-slot gate
window — the snapshot would then match the new source even though no
gate ever ran it (q21_waiting_supplier, rewritten r7, green row r5).
And "refresh only gate-green names" at round end still has the same
hole one round later, because the script necessarily runs BEFORE the
round's gate. Reconstruction closes it exactly: each round's gate runs
against the tree of its `round N: verdict/...` commit (that commit
only ADDS result files), so the fingerprint a green row certifies is
computable from git forever. Per name: find its latest green round R,
check out round R's gate commit into a temp worktree, fingerprint the
query there. Names never green are omitted (_auto_recheck only
consults the snapshot for green names; their first green gate will
mint their entry).

Run once per round (idempotent):

    python scripts/update_query_hashes.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # __spark_entry__ + the queries package

# run inside each historical worktree; prints {name: fingerprint} JSON.
# QUERIES/ORACLES is the stable module contract across all rounds. The
# blob is (query source, oracle SQL, sources of every queries.py
# top-level helper the query TRANSITIVELY references, sorted by name):
# including helpers closes the hole where an edit to a queries.py-local
# shared helper (r10's `_kmv_segment_cache` cache-key fix) changes
# behavior without drifting any query's own source. Because this script
# RECONSTRUCTS the snapshot from gate-commit worktrees, redefining the
# blob is safe — one rerun regenerates every entry under the new
# definition. MUST stay in sync with __spark_entry__._query_fingerprint
# (tests/test_entry_order.py::test_fingerprint_definitions_agree).
_FP_SNIPPET = """
import ast, hashlib, inspect, json, os, re, sys
sys.path.insert(0, sys.argv[1])
from visual_asset_management_system_spark.queries import ORACLES, QUERIES
qpath = os.path.join(
    sys.argv[1], "visual_asset_management_system_spark", "queries.py")
with open(qpath) as f:
    src_all = f.read()
tree = ast.parse(src_all)
helper_src = {}
for node in tree.body:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        helper_src[node.name] = ast.get_source_segment(src_all, node) or ""
for fn in QUERIES.values():
    helper_src.pop(getattr(fn, "__name__", ""), None)
helper_words = {
    n: set(re.findall(r"\\b\\w+\\b", s)) for n, s in helper_src.items()
}
helper_refs = {
    n: {m for m in helper_src if m != n and m in helper_words[n]}
    for n in helper_src
}
out = {}
for name, fn in QUERIES.items():
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = ""
    words = set(re.findall(r"\\b\\w+\\b", src))
    own = getattr(fn, "__name__", name)
    deps = set()
    frontier = {h for h in helper_src if h in words and h != own}
    while frontier:
        deps |= frontier
        frontier = {m for h in frontier for m in helper_refs[h]} - deps - {own}
    blob = src + "\\n--oracle--\\n" + ORACLES.get(name, "")
    src_fp = hashlib.md5(blob.encode()).hexdigest()
    for h in sorted(deps):
        blob += "\\n--helper:" + h + "--\\n" + helper_src[h]
    out[name] = {"src": src_fp, "full": hashlib.md5(blob.encode()).hexdigest()}
print(json.dumps(out))
"""


def latest_green_rounds() -> dict[str, int]:
    """name -> latest round with a GREEN row. Delegates to
    __spark_entry__._latest_rows so the green predicate (rows/schema/
    hash/err) has exactly ONE definition — a drift between the snapshot
    builder and the recheck machinery would silently re-open the
    staleness hole this script closes."""
    import __spark_entry__ as entry

    return {n: r for n, (r, ok) in entry._latest_rows().items() if ok}


def gate_commits(repo: str = REPO) -> dict[int, str]:
    """round -> sha of its `round N: verdict/...` commit (the tree the
    round-N gate ran, modulo the result files that commit adds)."""
    try:
        log = subprocess.run(
            ["git", "log", "--format=%H %s"],
            cwd=repo, capture_output=True, text=True, timeout=15,
        ).stdout
    except (OSError, subprocess.SubprocessError):
        return {}
    out: dict[int, str] = {}
    for line in log.splitlines():
        m = re.match(r"(\w+) round (\d+): verdict", line)
        if m:
            out.setdefault(int(m.group(2)), m.group(1))
    return out


def historical_fingerprints(sha: str, repo: str = REPO) -> dict[str, str]:
    """Fingerprints of the repo as of ``sha`` via a temp worktree."""
    with tempfile.TemporaryDirectory(prefix="qh_") as tmp:
        wt = os.path.join(tmp, "wt")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=repo, check=True, capture_output=True, timeout=60,
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _FP_SNIPPET, wt],
                capture_output=True, text=True, timeout=300, cwd=wt,
            )
            if proc.returncode != 0:
                raise RuntimeError(proc.stderr[-2000:])
            return json.loads(proc.stdout.strip().splitlines()[-1])
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=repo, capture_output=True, timeout=60,
            )


def reconstruct(
    green_rounds: dict[str, int],
    fp_at: dict[int, dict[str, str]],
    old: dict[str, str],
) -> dict[str, str]:
    """Pure merge: name -> fingerprint at its latest green gate.
    Falls back to the prior entry when a round's commit or historical
    fingerprint is unavailable (never invents a current-tree hash for
    an old green row)."""
    out: dict[str, str] = {}
    for name, rnd in green_rounds.items():
        hist = fp_at.get(rnd, {})
        if name in hist:
            out[name] = hist[name]
        elif name in old:
            out[name] = old[name]
    return dict(sorted(out.items()))


if __name__ == "__main__":
    path = os.path.join(REPO, "QUERY_HASHES.json")
    try:
        with open(path) as f:
            old = json.load(f)
    except (OSError, ValueError):
        old = {}
    green = latest_green_rounds()
    commits = gate_commits()
    fp_at: dict[int, dict[str, str]] = {}
    for rnd in sorted({r for r in green.values()}):
        sha = commits.get(rnd)
        if sha is None:
            print(f"round {rnd}: no gate commit found — keeping old entries")
            continue
        try:
            fp_at[rnd] = historical_fingerprints(sha)
            print(f"round {rnd}: fingerprinted {len(fp_at[rnd])} queries @ {sha[:10]}")
        except Exception as exc:  # noqa: BLE001 — keep old entries on any failure
            print(f"round {rnd}: reconstruction failed ({exc}) — keeping old entries")
    merged = reconstruct(green, fp_at, old)
    changed = sorted(n for n in merged if old.get(n) != merged[n])
    dropped = sorted(n for n in old if n not in merged)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(
        f"wrote {len(merged)} fingerprints to {path} "
        f"(changed: {len(changed)} {changed[:6]}; dropped never/red: "
        f"{len(dropped)} {dropped[:6]})"
    )
