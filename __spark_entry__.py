"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
BASELINE.json scale extensions, as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents (same column
names/aliases; VAMS derived views inlined as CTEs). Entries without an
oracle are non-SQL-expressible (LSH candidate generation internals) and
get the driver's rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from visual_asset_management_system_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's oracle gate checks the FIRST 50 entries of queries().
# Registration order alone let round 2's new queries push the entire
# LLM-pipeline/workflow block (registration idx 50-74) past the window,
# so those 25 shipped with no driver-confirmed correctness row
# (VERDICT.md r2, finding #2). queries() therefore emits a deliberate
# priority order instead of raw registration order:
#   1. entries with no driver-green row yet (never inside the window),
#      in registration order — new queries added this round land here
#      automatically;
#   2. entries whose engine code or oracle changed this round and need a
#      re-check (the r2 red row q_vams_link_auth_counts after its
#      BIGINT-cast oracle fix; the one-hop family after the broadcast
#      rework in operators/graph.py);
#   3. the remaining twice-driver-green entries, registration order.
_RECHECK_OVERRIDES: list[str] = [
    # manual overrides ONLY — the recheck set is otherwise COMPUTED from
    # git history by _auto_recheck() (a green row is stale when an
    # engine module the query imports changed after the round that
    # checked it). Add a name here only when the automation can't see
    # the dependency (e.g. a shared helper imported at queries.py
    # module top rather than inside the query function).
    #
    # (r8 pins q21_waiting_supplier / q_workflow_executions /
    # q_doc_sample_split pruned: all three driver-green in
    # CORRECTNESS_r08; staleness from the in-round edits they pinned
    # against is now caught by the hash-drift class, which runs even
    # for the round in progress.)
]

#: the driver's oracle gate checks this many leading queries() entries
_GATE_WINDOW = 50


def _latest_rows() -> dict[str, tuple[int, bool]]:
    """Most recent CORRECTNESS_r*.json row per name: name -> (round, ok).

    Self-maintaining across rounds: a red row (hash/schema/rows
    mismatch) or a never-recorded name sorts to the front of the next
    round's window automatically. A row counts green only if rows and
    schema matched and the value hash did not fail (rows-only entries
    have no hash and count on rows+schema)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    # the MOST RECENT row per name wins: a red row in r02 must not keep
    # a name re-greened in r04 pinned to the priority window forever
    latest: dict[str, tuple[int, bool]] = {}
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match") is not False
                and row.get("err") is None
            )
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, ok)
    return latest


def _auto_recheck(green: dict[str, int]) -> list[str]:
    """Compute the stale-green set from git history.

    A green row from round R is STALE when any engine module the query
    function imports (``from .operators.x import ...`` in its source)
    was committed after round R's gate ran (approximated by the
    "round R: verdict/..." commit timestamp). Oldest-green-first so a
    capped window refreshes the most out-of-date rows first. Returns []
    on any git/inspect failure — the priority order degrades to
    never-checked-first, which is always safe."""
    import inspect
    import re
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        log = subprocess.run(
            ["git", "log", "--format=C %ct %s", "--name-only"],
            cwd=here, capture_output=True, text=True, timeout=15,
        ).stdout
    except (OSError, subprocess.SubprocessError):
        return []
    round_ts: dict[int, int] = {}
    file_ts: dict[str, int] = {}
    cur_ts = 0
    for line in log.splitlines():
        m = re.match(r"C (\d+) (.*)", line)
        if m:
            cur_ts = int(m.group(1))
            rm = re.match(r"round (\d+): verdict", m.group(2))
            if rm:
                round_ts[int(rm.group(1))] = cur_ts
        elif line.strip():
            file_ts.setdefault(line.strip(), cur_ts)
    if not round_ts:
        return []

    pkg = "visual_asset_management_system_spark"

    # identifier -> module for queries.py's MODULE-TOP relative imports
    # (e.g. `from .operators.authz import row_filter`), so queries whose
    # function body merely USES such a helper still pick up staleness
    # from the helper's module.
    import ast

    top_ident_mod: dict[str, str] = {}
    try:
        qpath = os.path.join(here, pkg, "queries.py")
        with open(qpath) as f:
            tree = ast.parse(f.read())
        for node in tree.body:
            if isinstance(node, ast.ImportFrom) and node.level == 1 and node.module:
                for alias in node.names:
                    top_ident_mod[alias.asname or alias.name] = node.module
    except (OSError, SyntaxError):
        pass

    # per-query source+oracle fingerprints captured at the end of the
    # last round (scripts/update_query_hashes.py) — catches queries.py-
    # LOCAL changes (shared helpers, inline rewrites) that git module
    # attribution can't see
    import hashlib
    import json

    snapshot: dict[str, str] = {}
    try:
        with open(os.path.join(here, "QUERY_HASHES.json")) as f:
            snapshot = json.load(f)
    except (OSError, ValueError):
        pass

    from visual_asset_management_system_spark.queries import ORACLES

    # two staleness classes, hash drift first: a fingerprint mismatch
    # PROVES the query/oracle changed since its green gate, while a
    # module-timestamp hit only says an imported module changed (the
    # query may be unaffected) — when the window can't hold both, the
    # proven class must not be crowded out. Oldest green first within
    # each class.
    stale: list[tuple[int, int, str]] = []
    for name, rnd in green.items():
        if name not in QUERIES:
            continue
        try:
            src = inspect.getsource(QUERIES[name])
        except (OSError, TypeError):
            continue
        # hash drift FIRST, before the gate-timestamp guard: a
        # fingerprint mismatch proves the source changed since the
        # snapshot regardless of which round greened it, and the round
        # in progress never has a `round N: verdict` commit yet — so a
        # green name edited post-gate in the current round would
        # otherwise escape both staleness classes (VERDICT r8 #1).
        if name in snapshot:
            blob = src + "\n--oracle--\n" + ORACLES.get(name, "")
            if hashlib.md5(blob.encode()).hexdigest() != snapshot[name]:
                stale.append((0, rnd, name))
                continue
        gate_ts = round_ts.get(rnd)
        if gate_ts is None:
            continue
        mods = set(re.findall(r"from \.((?:\w+\.)*\w+) import", src))
        words = set(re.findall(r"\b\w+\b", src))
        mods.update(m for ident, m in top_ident_mod.items() if ident in words)
        for mod in mods:
            path = f"{pkg}/{mod.replace('.', '/')}.py"
            if file_ts.get(path, 0) > gate_ts:
                stale.append((1, rnd, name))
                break
    return [n for _, _, n in sorted(stale)]


def _driver_order(names: list[str]) -> list[str]:
    latest = _latest_rows()
    green = {n: r for n, (r, ok) in latest.items() if ok}
    never = [n for n in names if n not in green]
    auto = _auto_recheck(green)
    recheck = [
        n
        for n in _RECHECK_OVERRIDES + auto
        if n in names and n in green and n not in never
    ]
    # dedupe, keep order; cap so never + recheck fit the gate window
    seen: set[str] = set()
    recheck = [n for n in recheck if not (n in seen or seen.add(n))]
    recheck = recheck[: max(0, _GATE_WINDOW - len(never))]
    # oldest green row first: when never + recheck leave spare window
    # capacity, it drains the freshness tail instead of re-running
    # whatever happened to register earliest
    order_idx = {n: i for i, n in enumerate(names)}
    rest = sorted(
        (n for n in names if n in green and n not in set(recheck)),
        key=lambda n: (green[n], order_idx[n]),
    )
    return never + recheck + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _driver_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    order = _driver_order(list(QUERIES))
    return {n: ORACLES[n] for n in order if n in ORACLES}
