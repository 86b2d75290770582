#!/usr/bin/env python
"""Round-15 probe: q21 distinct-aggregate Expand vs two-level aggregation.

The shipped q21 computes two countDistinct aggregates per order, which
Catalyst plans via RewriteDistinctAggregates: an Expand node replicates
every lineitem row 3x before the first shuffle (plan r14: 1.09E6 rows
shuffled post-partial-agg, then 8.69E5 re-shuffled for the second
distinct phase). Arms:

  old   — the replaced r14 distinct-aggregate form, FROZEN INLINE
          (not a Q.QUERIES call — after the change ships, the registry
          resolves to the new form and the A/B would compare the new
          code against itself).
  two   — two-level aggregation: groupBy(l_orderkey, l_suppkey) first
          (has_r flag + per-supplier R-line count), then
          groupBy(l_orderkey). No Expand; both exchanges carry
          un-replicated rows with map-side combine.
  onex  — 'two' with an explicit repartition("l_orderkey") before the
          first groupBy: hash(okey) satisfies the clustering of BOTH
          aggregates, so the whole double aggregation runs on ONE
          exchange of the raw projected rows.

Equality gate: the query's ordered top-10 rows asserted identical
across all arms before any timing; timing is interleaved within one
session (the r14/r15 discipline).

Usage: python scripts/probe_r15_q21.py [runs]
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
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _finish(spark, per_order):
    """Everything downstream of the per-order aggregate, verbatim from
    the shipped q21 (filter -> orders join -> supplier join -> final
    agg -> top-10)."""
    t = Q.tables(spark, SF_DIR)
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("r_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_r_lines").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


def _two_level_per_order(li):
    """Per-order aggregate WITHOUT distinct aggregates: collapse to the
    (order, supplier) grain first, then to the order grain.

    Equivalence to the shipped distinct-aggregate form, including NULL
    edge cases (none exist in the fixture, but the forms must agree on
    any input):
      n_supp    = countDistinct(l_suppkey)
                = count of non-null-suppkey groups            (NULL
                  suppkey forms its own group; countDistinct skips it,
                  so count only groups with a non-null key);
      n_r_supp  = countDistinct(when(is_r, l_suppkey))
                = count of non-null-suppkey groups with any R line
                  (has_r <=> the group contributed a non-null value);
      r_suppkey = min(when(is_r, l_suppkey))
                = min over has_r groups' keys (min skips the NULL-key
                  group because when(has_r, NULL) is NULL);
      n_r_lines = count(when(is_r, 1)) = sum of per-group R-line
                  counts (0-valued groups contribute 0).
    """
    is_r = F.col("l_returnflag") == "R"
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(is_r).alias("has_r"),
        F.count(F.when(is_r, F.lit(1))).alias("n_r_lines_s"),
    )
    has_key = F.col("l_suppkey").isNotNull()
    return per_os.groupBy("l_orderkey").agg(
        F.count(F.when(has_key, F.lit(1))).alias("n_supp"),
        F.count(F.when(F.col("has_r") & has_key, F.lit(1))).alias("n_r_supp"),
        F.min(F.when(F.col("has_r"), F.col("l_suppkey"))).alias("r_suppkey"),
        F.sum("n_r_lines_s").alias("n_r_lines"),
    )


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="probe-r15-q21")
    spark.sparkContext.setLogLevel("ERROR")
    li = Q.tables(spark, SF_DIR)["lineitem"]

    def arm_old():
        is_r = F.col("l_returnflag") == "R"
        per_order = li.groupBy("l_orderkey").agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(is_r, F.col("l_suppkey"))).alias("n_r_supp"),
            F.min(F.when(is_r, F.col("l_suppkey"))).alias("r_suppkey"),
            F.count(F.when(is_r, F.lit(1))).alias("n_r_lines"),
        )
        return _finish(spark, per_order)

    def arm_two():
        return _finish(spark, _two_level_per_order(li))

    def arm_onex():
        return _finish(
            spark, _two_level_per_order(li.repartition("l_orderkey"))
        )

    arms = (("old", arm_old), ("two", arm_two), ("onex", arm_onex))

    # equality gate FIRST (ordered rows — the query's output IS ordered)
    ref = [tuple(r) for r in arm_old().collect()]
    for label, arm in arms[1:]:
        got = [tuple(r) for r in arm().collect()]
        assert got == ref, f"ARM {label} DIFFERS: {got} vs {ref}"
    print(f"equality gate PASSED: {len(ref)} identical ordered rows", flush=True)

    times = {label: [] for label, _ in arms}
    for i in range(runs):
        for label, arm in arms:
            spark.sparkContext.setJobDescription(f"q21-ab:{label}:{i}")
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
    med = {label: statistics.median(xs) for label, xs in times.items()}
    for label in ("two", "onex"):
        print(f"speedup old/{label}: {med['old'] / med[label]:.3f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
