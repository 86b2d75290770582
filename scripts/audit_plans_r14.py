#!/usr/bin/env python
"""Summarize plans/r14/*_<suffix>.txt: final-plan exchange count, join
strategies, Python-eval nodes, pushed filters — one line per query.
Usage: python scripts/audit_plans_r14.py [suffix]
"""

from __future__ import annotations

import glob
import os
import re
import sys

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def final_plan(text: str) -> str:
    # the tree between "== Final Plan ==" (or plan start) and the
    # "== Initial Plan ==" marker; operator details section excluded
    body = text.split("\n\n", 1)[-1]
    tree = body.split("== Initial Plan ==")[0]
    # cut the numbered operator-details section (starts at "(1) ")
    m = re.search(r"\n\(\d+\) ", tree)
    return tree[: m.start()] if m else tree


def main() -> None:
    rows = []
    for path in sorted(glob.glob(os.path.join(HERE, "plans", "r14", f"*_{SUFFIX}.txt"))):
        name = os.path.basename(path)[: -(len(SUFFIX) + 5)]
        text = open(path).read()
        tree = final_plan(text)
        n_ex = len(re.findall(r"\bExchange\b", tree)) - len(
            re.findall(r"ReusedExchange", tree)
        )
        n_bex = len(re.findall(r"BroadcastExchange", tree))
        joins = {
            "BHJ": len(re.findall(r"BroadcastHashJoin", tree)),
            "SMJ": len(re.findall(r"SortMergeJoin", tree)),
            "SHJ": len(re.findall(r"ShuffledHashJoin", tree)),
            "BNLJ": len(re.findall(r"BroadcastNestedLoopJoin", tree)),
        }
        pyeval = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", tree))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", text))
        rddscan = len(re.findall(r"Scan ExistingRDD", tree))
        pqscan = len(re.findall(r"Scan parquet", tree))
        jstr = ",".join(f"{k}={v}" for k, v in joins.items() if v)
        rows.append(
            f"{name:32s} ex={n_ex:2d} (bcast={n_bex}) {jstr or 'no-joins':24s} "
            f"scans: pq={pqscan} rdd={rddscan} pushed={pushed} py={pyeval}"
        )
    print("\n".join(rows))


if __name__ == "__main__":
    main()
