#!/usr/bin/env python
"""Round-15 probe: q_doc_decontaminate benchmark_pred single-explode A/B.

Arm OLD is the r14 two-frame contamination call (benchmark frame
n-grammed separately — documents scanned for docs, bench, AND the
mutated derivation); arm NEW is the shipped ``benchmark_pred`` form
(dictionary aggregated from the one checkpointed gram relation the
probe side explodes). Results asserted bit-equal (ordered rows — the
query output is ordered by doc_id) before any timing; runs interleave
within one session.

Usage: python scripts/probe_r15_decontam.py [runs]
SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from visual_asset_management_system_spark import queries as Q  # noqa: E402
from visual_asset_management_system_spark.operators.corpus import (  # noqa: E402
    contamination,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _train_bench(spark):
    t = Q.tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda tok: tok != "")
    mutated = bench.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(1)))
        ).alias("text"),
    )
    return docs.unionByName(mutated), bench


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="probe-r15-decontam")
    spark.sparkContext.setLogLevel("ERROR")

    def arm_old():
        train, bench = _train_bench(spark)
        return contamination(train, bench, n=8, min_overlap=3).orderBy("doc_id")

    def arm_new():
        return Q.QUERIES["q_doc_decontaminate"](spark, SF_DIR)

    arms = (("old", arm_old), ("new", arm_new))

    ref = [tuple(r) for r in arm_old().collect()]
    got = [tuple(r) for r in arm_new().collect()]
    assert got == ref, (
        f"ARMS DIFFER: old={len(ref)} new={len(got)}; "
        f"first diff: {next((a, b) for a, b in zip(ref, got) if a != b)}"
    )
    print(f"equality gate PASSED: {len(ref)} identical ordered rows", flush=True)

    times = {label: [] for label, _ in arms}
    for i in range(runs):
        for label, arm in arms:
            spark.sparkContext.setJobDescription(f"decontam-ab:{label}:{i}")
            t0 = time.time()
            arm().write.format("noop").mode("overwrite").save()
            times[label].append(time.time() - t0)
    for label, _ in arms:
        xs = times[label]
        print(
            f"{label}: min={min(xs):.3f} med={statistics.median(xs):.3f} "
            f"all={[round(x, 3) for x in xs]}",
            flush=True,
        )
    print(
        f"speedup old/new: "
        f"{statistics.median(times['old']) / statistics.median(times['new']):.3f}x",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
