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
    # module top rather than inside the query function) — or when the
    # automation's CLASS ORDER would push a this-round ALGORITHMIC
    # edit out of the window behind the helper-drift backfill.
    #
    # (r8 pins q21_waiting_supplier / q_workflow_executions /
    # q_doc_sample_split pruned: all three driver-green in
    # CORRECTNESS_r08; staleness from the in-round edits they pinned
    # against is now caught by the hash-drift class, which runs even
    # for the round in progress.)
    #
    # (r11 pins q_doc_setsim_join / q_vams_pagerank pruned: both
    # driver-green in CORRECTNESS_r11; the hash-drift class covers any
    # further edits to them.)
    #
    # (r12 pins q_ann_store_topk / q_doc_setsim_join pruned: both
    # driver-green in CORRECTNESS_r12; any r13 edits to their engine
    # paths are caught by the hash-drift class.)
    #
    # (r13 pins — the 8 similarity names + q_doc_setsim_join +
    # q_vams_descendants/q_vams_related_components — pruned: all ten
    # driver-green in CORRECTNESS_r13; hash-drift covers further edits.)
    #
    # (r14 pin q_embedding_quantize pruned: driver-green in
    # CORRECTNESS_r14 — rows/schema/hash all matched; hash-drift
    # covers further edits.)
    #
    # r15 (optimization round 2): no manual pins — the round's edits
    # (setsim dictionary crossover, DSIR target_pred single-scan,
    # descendants guard hardening) are all module-level engine changes
    # the hash-drift / module-staleness classes surface on their own.
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

    A green row from round R is STALE when a SYMBOL the query function
    references, in an engine module it imports (``from .operators.x
    import ...`` in its source), changed between round R's gate commit
    (the "round R: verdict/..." commit) and the working tree.
    Module-level timestamp attribution alone over-flags: r10's edit to
    graph.py's ``descendants`` marked all 11 graph.py importers stale
    and pushed 4 genuinely-oldest r6 greens out of the 50-wide gate
    window (VERDICT r10 "What's missing" #1). The refinement diffs the
    module's top-level defs/classes between the gate tree and the
    working tree (intra-module transitive closure: a symbol is changed
    if its own source changed or it references a changed symbol), and
    flags the query only when its source mentions a changed symbol. Any
    preamble change (module constants, imports) conservatively flags
    every importer, and any diff failure degrades to the old
    file-timestamp behavior. Oldest-green-first so a capped window
    refreshes the most out-of-date rows first. Returns [] on any
    git/inspect failure — the priority order degrades to
    never-checked-first, which is always safe."""
    import inspect
    import re
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        log = subprocess.run(
            ["git", "log", "--format=C %ct %H %s", "--name-only"],
            cwd=here, capture_output=True, text=True, timeout=15,
        ).stdout
    except (OSError, subprocess.SubprocessError):
        return []
    round_ts: dict[int, int] = {}
    round_sha: dict[int, str] = {}
    file_ts: dict[str, int] = {}
    cur_ts = 0
    for line in log.splitlines():
        m = re.match(r"C (\d+) ([0-9a-f]{40}) (.*)", line)
        if m:
            cur_ts = int(m.group(1))
            rm = re.match(r"round (\d+): verdict", m.group(3))
            if rm:
                round_ts[int(rm.group(1))] = cur_ts
                round_sha[int(rm.group(1))] = m.group(2)
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
    # alias -> real imported name, for `from .x import real as alias` at
    # module top: the query's source then contains only the ALIAS, so
    # the symbol-level `words & changed` test below would never see the
    # real name and an aliased import of a changed symbol would slip
    # through silently (the pre-symbol-level behavior over-flagged but
    # never under-flagged — keep that property)
    top_alias_orig: dict[str, str] = {}
    try:
        qpath = os.path.join(here, pkg, "queries.py")
        with open(qpath) as f:
            tree = ast.parse(f.read())
        for node in tree.body:
            if isinstance(node, ast.ImportFrom) and node.level == 1 and node.module:
                for alias in node.names:
                    top_ident_mod[alias.asname or alias.name] = node.module
                    if alias.asname and alias.asname != alias.name:
                        top_alias_orig[alias.asname] = alias.name
    except (OSError, SyntaxError):
        pass

    # per-query source+oracle+referenced-helper fingerprints captured at
    # each name's green gate (scripts/update_query_hashes.py) — catches
    # queries.py-LOCAL changes (shared helpers, inline rewrites) that
    # git module attribution can't see
    import json

    snapshot: dict[str, str] = {}
    try:
        with open(os.path.join(here, "QUERY_HASHES.json")) as f:
            snapshot = json.load(f)
    except (OSError, ValueError):
        pass

    from visual_asset_management_system_spark.queries import ORACLES

    # three staleness classes, most-proven first; oldest green round
    # first within each class:
    #   0 src-drift: the query's own source or oracle changed since its
    #     green gate — a direct edit, must never be crowded out;
    #   1 helper-drift: a queries.py-local helper the query transitively
    #     references changed since its gate (r10's _kmv_segment_cache
    #     fix) — proven relevant but indirect. NOTE: redefining the
    #     fingerprint to include helpers makes ALL historical helper
    #     churn visible at once (~140 names in r11); the oldest-first
    #     order makes this transient backfill coincide with the
    #     freshness-tail drain, and class 0 stays ahead of it;
    #   2 module-staleness: an imported engine module changed a symbol
    #     the query references since its gate (symbol-diffed — plain
    #     file timestamps over-flag; see _changed_symbols).
    import hashlib

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
        snap = snapshot.get(name)
        if snap is not None:
            src_fp = hashlib.md5(
                (src + "\n--oracle--\n" + ORACLES.get(name, "")).encode()
            ).hexdigest()
            if isinstance(snap, str):
                # legacy single-hash entry (pre-r11 snapshot): src+oracle
                if src_fp != snap:
                    stale.append((0, rnd, name))
                    continue
            else:
                if src_fp != snap.get("src"):
                    stale.append((0, rnd, name))
                    continue
                if _query_fingerprint(name, src) != snap.get("full"):
                    stale.append((1, rnd, name))
                    continue
        gate_ts = round_ts.get(rnd)
        if gate_ts is None:
            continue
        mods = set(re.findall(r"from \.((?:\w+\.)*\w+) import", src))
        words = set(re.findall(r"\b\w+\b", src))
        mods.update(m for ident, m in top_ident_mod.items() if ident in words)
        # translate module-top aliases back to the real symbol names so
        # the changed-symbol intersection can see them (body-level
        # aliased imports need no help: the import statement's text —
        # including the real name — is part of the query's source)
        words.update(
            orig for alias, orig in top_alias_orig.items() if alias in words
        )
        sha = round_sha.get(rnd)
        for mod in mods:
            path = f"{pkg}/{mod.replace('.', '/')}.py"
            if file_ts.get(path, 0) > gate_ts:
                changed = _changed_symbols(sha, path, here) if sha else None
                if changed is None or words & changed:
                    stale.append((2, rnd, name))
                    break
    return [n for _, _, n in sorted(stale)]


_HELPER_TABLE: "tuple[dict[str, str], dict[str, set[str]]] | None" = None


def _helper_table() -> "tuple[dict[str, str], dict[str, set[str]]]":
    """(helper_src, helper_refs) for queries.py's top-level defs/classes.

    helper_src: symbol -> source segment (decorators included via the
    segment starting at the def; queries.py uses no decorators on
    helpers). helper_refs: symbol -> other top-level symbols its source
    mentions (word match). Cached per process — queries.py does not
    change under a running driver. MUST stay in sync with the
    _FP_SNIPPET in scripts/update_query_hashes.py (tested by
    tests/test_entry_order.py::test_fingerprint_definitions_agree)."""
    global _HELPER_TABLE
    if _HELPER_TABLE is not None:
        return _HELPER_TABLE
    import ast
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(
        here, "visual_asset_management_system_spark", "queries.py"
    )
    with open(path) as f:
        src_all = f.read()
    tree = ast.parse(src_all)
    from visual_asset_management_system_spark.queries import QUERIES

    helper_src: dict[str, str] = {}
    for node in tree.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            helper_src[node.name] = ast.get_source_segment(src_all, node) or ""
    # registered query functions are NOT helpers: a docstring that
    # merely NAMES a sibling query (q_bottomk_merged's does) would
    # otherwise inherit that query's entire body into this one's
    # fingerprint — churn for a query whose behavior did not change,
    # while the sibling is already gated independently. No query calls
    # another query function (they are standalone registrations).
    for fn in QUERIES.values():
        helper_src.pop(getattr(fn, "__name__", ""), None)
    # tokenize once per helper, not once per (helper, candidate) pair —
    # the quadratic form ran ~36k full-source regex scans per process
    helper_words = {
        n: set(re.findall(r"\b\w+\b", s)) for n, s in helper_src.items()
    }
    helper_refs = {
        n: {m for m in helper_src if m != n and m in helper_words[n]}
        for n in helper_src
    }
    _HELPER_TABLE = (helper_src, helper_refs)
    return _HELPER_TABLE


def _query_fingerprint(name: str, src: "str | None" = None) -> str:
    """md5 over (query source, oracle SQL, and the sources of every
    queries.py top-level helper the query transitively references).

    Including referenced helpers closes the staleness hole git module
    attribution and the plain src+oracle blob both miss: an edit to a
    queries.py-LOCAL shared helper (e.g. r10's `_kmv_segment_cache`
    cache-key fix) changes behavior without touching any query
    function's own source or any imported engine module. Helper
    sources are appended sorted by name so the blob is deterministic.
    MUST stay in sync with _FP_SNIPPET in
    scripts/update_query_hashes.py."""
    import hashlib
    import inspect
    import re

    from visual_asset_management_system_spark.queries import ORACLES, QUERIES

    fn = QUERIES[name]
    if src is None:
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = ""
    helper_src, helper_refs = _helper_table()
    words = set(re.findall(r"\b\w+\b", src))
    own = getattr(fn, "__name__", name)
    deps: set[str] = set()
    frontier = {h for h in helper_src if h in words and h != own}
    while frontier:
        deps |= frontier
        frontier = {
            m for h in frontier for m in helper_refs[h]
        } - deps - {own}
    blob = src + "\n--oracle--\n" + ORACLES.get(name, "")
    for h in sorted(deps):
        blob += f"\n--helper:{h}--\n" + helper_src[h]
    return hashlib.md5(blob.encode()).hexdigest()


_SYMDIFF_CACHE: dict[tuple[str, str], "set[str] | None"] = {}


def _changed_symbols(sha: str, path: str, here: str) -> "set[str] | None":
    """Top-level symbols of ``path`` that changed between commit ``sha``
    and the working tree, with intra-module transitive closure (a
    symbol counts changed if its own def/class source — including
    decorators — changed, or if its source references a changed
    symbol). Returns None to mean "treat every symbol as changed": on
    any parse/git failure, when the file didn't exist at ``sha``, or
    when the module preamble (imports, constants, any non-def/class
    top-level statement) changed — callers must then fall back to
    module-level staleness. The closure is computed over the CURRENT
    source: a renamed helper makes both old and new names 'changed',
    and callers of the old name no longer parse anyway."""
    import ast
    import hashlib
    import re
    import subprocess

    key = (sha, path)
    if key in _SYMDIFF_CACHE:
        return _SYMDIFF_CACHE[key]

    def fingerprints(src: str) -> "tuple[dict[str, str], str] | None":
        try:
            tree = ast.parse(src)
        except SyntaxError:
            return None
        syms: dict[str, str] = {}
        preamble: list[str] = []
        for node in tree.body:
            seg = ast.get_source_segment(src, node) or ""
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                deco = "".join(
                    ast.get_source_segment(src, d) or "" for d in node.decorator_list
                )
                syms[node.name] = hashlib.md5((deco + seg).encode()).hexdigest()
            else:
                preamble.append(seg)
        return syms, hashlib.md5("\n".join(preamble).encode()).hexdigest()

    result: "set[str] | None"
    try:
        old = subprocess.run(
            ["git", "show", f"{sha}:{path}"],
            cwd=here, capture_output=True, text=True, timeout=15,
        )
        with open(os.path.join(here, path)) as f:
            new_src = f.read()
        if old.returncode != 0:
            result = None  # file absent at the gate — everything is new
        else:
            of, nf = fingerprints(old.stdout), fingerprints(new_src)
            if of is None or nf is None or of[1] != nf[1]:
                result = None  # unparseable or preamble drift
            else:
                osyms, nsyms = of[0], nf[0]
                changed = {
                    n
                    for n in set(osyms) | set(nsyms)
                    if osyms.get(n) != nsyms.get(n)
                }
                # intra-module closure over current sources; decorator
                # text is INCLUDED in each symbol's reference set (the
                # def-segment starts below the decorators) so a change
                # to a locally-defined decorator propagates to the
                # functions it wraps, matching the fingerprint half
                tree = ast.parse(new_src)
                refs = {
                    node.name: set(
                        re.findall(
                            r"\b\w+\b",
                            (ast.get_source_segment(new_src, node) or "")
                            + "".join(
                                ast.get_source_segment(new_src, d) or ""
                                for d in node.decorator_list
                            ),
                        )
                    )
                    for node in tree.body
                    if isinstance(
                        node,
                        (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
                    )
                }
                grew = True
                while grew:
                    grew = False
                    for name, ws in refs.items():
                        if name not in changed and ws & changed:
                            changed.add(name)
                            grew = True
                result = changed
    except (OSError, subprocess.SubprocessError, SyntaxError, ValueError):
        result = None
    _SYMDIFF_CACHE[key] = result
    return result


_ORDER_CACHE: dict[tuple[str, ...], list[str]] = {}


def _driver_order(names: list[str]) -> list[str]:
    # queries() and oracle_sql() both need the order in one driver run;
    # the staleness computation (git symbol diffs + 190 helper-closure
    # fingerprints) costs ~15 s, so memoize per process
    ck = tuple(names)
    if ck in _ORDER_CACHE:
        return _ORDER_CACHE[ck]
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
    _ORDER_CACHE[ck] = never + recheck + rest
    return _ORDER_CACHE[ck]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _driver_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    order = _driver_order(list(QUERIES))
    return {n: ORACLES[n] for n in order if n in ORACLES}
