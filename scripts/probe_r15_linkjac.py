#!/usr/bin/env python
"""Round-15 probe: link-jaccard undirected-view staging A/B.

jaccard_link_prediction recomputes `und` (distinct undirected edge
view — 2 asset_links scans each) for all three consumers (degree agg,
pair-gen left, pair-gen right), and `deg` twice more for the
denominator joins: PLAN_STATS shows 4 underlying part scans. Arms:

  old   — shipped form (frozen call through the operator).
  ckpt  — `und` checkpoint-staged once, all consumers read it.
  ckpt2 — `und` AND `deg` both checkpoint-staged.

Equality gate on the full q_vams_link_jaccard output (ordered top-50)
plus the guarded variant; timing interleaved in one session.

Usage: python scripts/probe_r15_linkjac.py [runs]
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
from visual_asset_management_system_spark.operators.checkpointing import (  # noqa: E402
    maybe_checkpoint,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def staged_link_jaccard(edges, max_degree=None, stage_deg=False):
    src, dst = "from_asset_id", "to_asset_id"
    und = maybe_checkpoint(
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionAll(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    if stage_deg:
        deg = maybe_checkpoint(deg)
    gen = und
    if max_degree is not None:
        nbr_deg = deg.select(
            F.col("node").alias("nbr"), F.col("degree").alias("nbr_degree")
        )
        gen = (
            und.join(nbr_deg, "nbr")
            .filter(F.col("nbr_degree") <= max_degree)
            .select("node", "nbr")
        )
    rhs = gen.select(F.col("node").alias("node_b"), F.col("nbr").alias("nbr_b"))
    common = (
        gen.join(
            rhs, (F.col("nbr") == F.col("nbr_b")) & (F.col("node") < F.col("node_b"))
        )
        .groupBy(F.col("node").alias("node_a"), "node_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("node").alias("node_a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("node_b"), F.col("degree").alias("deg_b"))
    jac = F.floor(
        (
            F.col("n_common").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("n_common"))
        )
        * 1000000
        + 0.5
    ) / 1000000
    return (
        common.join(da, "node_a")
        .join(db, "node_b")
        .select("node_a", "node_b", "n_common", jac.alias("jaccard"))
    )


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="probe-r15-linkjac")
    spark.sparkContext.setLogLevel("ERROR")
    links = Q.tables(spark, SF_DIR)["asset_links"]

    def finish(df):
        return df.orderBy(F.desc("jaccard"), "node_a", "node_b").limit(50)

    def arm_old():
        return Q.QUERIES["q_vams_link_jaccard"](spark, SF_DIR)

    def arm_ckpt():
        return finish(staged_link_jaccard(links))

    def arm_ckpt2():
        return finish(staged_link_jaccard(links, stage_deg=True))

    arms = (("old", arm_old), ("ckpt", arm_ckpt), ("ckpt2", arm_ckpt2))

    ref = [tuple(r) for r in arm_old().collect()]
    for label, arm in arms[1:]:
        got = [tuple(r) for r in arm().collect()]
        assert got == ref, f"ARM {label} DIFFERS ({len(got)} vs {len(ref)} rows)"
    # guarded variant equality too (same operator change)
    g_ref = [
        tuple(r)
        for r in Q.QUERIES["q_vams_link_jaccard_guarded"](spark, SF_DIR).collect()
    ]
    g_got = [
        tuple(r) for r in finish(staged_link_jaccard(links, max_degree=10)).collect()
    ]
    assert g_got == g_ref, "guarded ARM DIFFERS"
    print(
        f"equality gate PASSED: {len(ref)} rows (+{len(g_ref)} guarded)", flush=True
    )

    times = {label: [] for label, _ in arms}
    for i in range(runs):
        for label, arm in arms:
            spark.sparkContext.setJobDescription(f"linkjac-ab:{label}:{i}")
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
    for label in ("ckpt", "ckpt2"):
        print(f"speedup old/{label}: {med['old'] / med[label]:.3f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
