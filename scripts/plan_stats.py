"""Snapshot per-query executed-plan structure → PLAN_STATS.json.

For every registered query at the correctness SF, record the structural
facts the 100 TB posture rests on: per-source-table FileScan counts and
the Exchange (shuffle) count of the FINAL adaptive plan. These are the
noise-proof numbers — wall-clock on a shared-CPU VM swings 1.5-3x
between runs with zero code change (see memory: bench-host-noise
protocol), while a plan's scan/exchange structure only moves when the
code does. tests/test_plan_lint.py enforces the budgets; this snapshot
makes round-over-round drift diffable:

    python scripts/plan_stats.py   # rewrites PLAN_STATS.json
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"

_SCAN_RE = re.compile(r"Location: [^\[]*\[([^\]]*)")
_TABLE_RE = re.compile(r"([A-Za-z0-9_]+)\.parquet")
_EXCHANGE_RE = re.compile(
    r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition|"
    r"RoundRobinPartitioning)"
)


def main() -> None:
    from visual_asset_management_system_spark.queries import QUERIES
    from visual_asset_management_system_spark.session import get_spark

    spark = get_spark(app_name="plan-stats")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")

    out: dict[str, dict] = {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, SF)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            scans: dict[str, int] = {}
            for loc in _SCAN_RE.finditer(final):
                for path in loc.group(1).split(","):
                    m = _TABLE_RE.search(path)
                    if m:
                        scans[m.group(1)] = scans.get(m.group(1), 0) + 1
            out[name] = {
                "scans": dict(sorted(scans.items())),
                "exchanges": len(_EXCHANGE_RE.findall(final)),
            }
        except Exception as exc:  # noqa: BLE001 — one row per failure
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}

    path = os.path.join(REPO, "PLAN_STATS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    n_err = sum(1 for v in out.values() if "error" in v)
    total_ex = sum(v.get("exchanges", 0) for v in out.values())
    print(
        f"wrote {len(out)} plans to {path} "
        f"(errors: {n_err}; total exchanges: {total_ex})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
