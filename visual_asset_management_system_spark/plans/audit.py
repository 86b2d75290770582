"""Executed-plan structure extraction — the ONE definition shared by
the plan lint (tests/test_plan_lint.py), the snapshot builder
(scripts/plan_stats.py), and the round-over-round regression gate.

Why structure, not wall-clock: on a shared-CPU host timings swing
1.5-3x between runs with zero code change, while per-table FileScan
counts and Exchange counts of the FINAL adaptive plan only move when
the code does. All counts here are over the final AQE section only —
the AdaptiveSparkPlan string repeats the pre-reuse initial plan below
an ``== Initial Plan ==`` marker, and counting that section would
double-charge every scan the runtime deduplicated (ADVICE r8: the
snapshot and the lint must slice the same way or their numbers are not
comparable despite sharing a metric name).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SCAN_RE = re.compile(r"Location: [^\[]*\[([^\]]*)")
#: source parquet tables (…/lineitem.parquet)
_TABLE_RE = re.compile(r"([A-Za-z0-9_]+)\.parquet")
#: materialized maintained state (…/spark-warehouse/search_assets_<tag>)
#: — the sf_dir tag is stripped so snapshots compare across SFs
_WAREHOUSE_RE = re.compile(r"spark-warehouse/([A-Za-z0-9_]+?)(?:_[0-9a-f]{8})?/?$")
_EXCHANGE_RE = re.compile(
    r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition|"
    r"RoundRobinPartitioning)"
)


def final_section(executed_plan: str) -> str:
    """The post-reuse section of an AdaptiveSparkPlan string."""
    return executed_plan.split("== Initial Plan ==")[0]


def table_scan_counts(executed_plan: str) -> dict[str, int]:
    """Per-source-table FileScan counts (final AQE section only).

    Counts both raw parquet sources and materialized warehouse tables —
    a repeated subtree over the postings artifact multiplies scans at
    100 TB exactly like one over ``lineitem`` does."""
    counts: dict[str, int] = {}
    for loc in _SCAN_RE.finditer(final_section(executed_plan)):
        for path in loc.group(1).split(","):
            path = path.strip()
            m = _TABLE_RE.search(path) or _WAREHOUSE_RE.search(path)
            if m:
                counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def exchange_count(executed_plan: str) -> int:
    """Exchange operators in the final AQE section."""
    return len(_EXCHANGE_RE.findall(final_section(executed_plan)))


def plan_structure(df: DataFrame) -> dict:
    """``{"scans": {table: n}, "exchanges": n}`` for an EXECUTED frame
    (call after an action so AQE has finalized the plan)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "scans": dict(sorted(table_scan_counts(plan).items())),
        "exchanges": exchange_count(plan),
    }


def structure_regressions(
    current: dict, baseline: dict, name: str
) -> list[str]:
    """Human-readable regression list: any table scanned MORE than the
    committed baseline says, or more exchanges. Improvements (fewer)
    pass — the snapshot is regenerated each round, so downward drift is
    folded in then; only growth needs a human decision NOW."""
    probs: list[str] = []
    base_scans = baseline.get("scans", {})
    for table, n in current.get("scans", {}).items():
        if n > base_scans.get(table, 0):
            probs.append(
                f"{name}: scans {table} {n}x (baseline "
                f"{base_scans.get(table, 0)}x)"
            )
    if current.get("exchanges", 0) > baseline.get("exchanges", 0):
        probs.append(
            f"{name}: {current['exchanges']} exchanges (baseline "
            f"{baseline['exchanges']})"
        )
    return probs
