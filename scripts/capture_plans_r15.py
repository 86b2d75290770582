#!/usr/bin/env python
"""Capture `.explain("formatted")` for bench queries into plans/r15/.

Usage: python scripts/capture_plans_r15.py <suffix> [query ...]
  suffix: "before" or "after" (file name suffix)
  with no query names, captures every BENCH_QUERIES entry.

Runs each query once (collect) so AQE settles on the final plan, then
writes plans/r15/<name>_<suffix>.txt with the formatted plan plus the
simple-mode plan (codegen spans). SF dir from $SPARK_GRAFT_SF_DIR
(default sf0.1 — the bench scale, so plans match the bench claims).
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from visual_asset_management_system_spark.queries import QUERIES, tables  # noqa: E402
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="capture-plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the maintained state exactly like bench.py so plans reflect
    # the bench execution environment
    t = tables(spark, SF_DIR)
    t["search_assets"].count()
    t["search_files"].count()
    from visual_asset_management_system_spark.queries import (  # noqa: E402
        _bucketed_embeddings,
        asset_inverted_index,
    )

    postings, stats = asset_inverted_index(t, SF_DIR)
    postings.count()
    stats.count()
    _bucketed_embeddings(spark, SF_DIR).count()

    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        t0 = time.time()
        try:
            df = QUERIES[name](spark, SF_DIR)
            df.collect()  # AQE settles on the final plan
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            buf2 = io.StringIO()
            with redirect_stdout(buf2):
                df.explain()
            simple = buf2.getvalue().split("== Initial Plan ==")[0]
            out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
            with open(out, "w") as f:
                f.write(f"# {name} @ {SF_DIR} ({suffix})\n\n")
                f.write(buf.getvalue())
                f.write("\n== simple (codegen spans) ==\n")
                f.write(simple)
            print(f"{name}: {time.time() - t0:.2f}s -> {out}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
