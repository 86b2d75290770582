#!/usr/bin/env python
"""Round-15 probe: descendants guard-hardening A/B (same session,
interleaved). OLD = the r14 anti-join guard (copied verbatim below),
NEW = the shipped pre-exclusion marker-join + absolute tripwire.
Equality asserted (sorted rows) before timing."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from visual_asset_management_system_spark import queries as Q  # noqa: E402
from visual_asset_management_system_spark.operators.checkpointing import (  # noqa: E402
    maybe_checkpoint,
)
from visual_asset_management_system_spark.operators.graph import (  # noqa: E402
    descendants,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- r14 implementation, frozen verbatim (docstring elided) -----------
OLD_SRC = True

def old_descendants(
    asset_links: DataFrame,
    database_id: str,
    asset_id: str,
    max_depth: int = 25,
    use_checkpoint: bool = True,
    levels_per_round: int = 3,
    dedup_guard_factor: float = 4.0,
) -> DataFrame:
    """Descendant set over parentChild edges: (database_id, asset_id,
    depth) with shortest-depth semantics and cycle safety.

    BFS with an accumulated visited set; a node re-reached through a
    cycle or a diamond is anti-joined away, so each node appears once at
    its minimum depth. Divergence from the reference's unbounded DFS is
    the documented depth cap.

    FRONTIER BATCHING: the sf1/sf3 soak measured this query's cost as
    100% fixed per-level driver latency (scaling exponent −0.15 — the
    work *shrinks* relative to data), so the loop expands
    ``levels_per_round · 2^round`` levels inside ONE driver round
    (geometric growth: O(log depth) rounds on a deep chain; an
    overshoot past the true depth only joins empty frontiers within
    the same action), then checkpoints and emptiness-checks the
    round's union ONCE. Within a
    round there is NO per-level exclusion — g_i is simply
    neighbors(g_{i−1}) — because chaining anti-joins against the
    accumulating union nests each sub-frontier's plan inside the next
    one's TWICE (source + exclusion side), i.e. 2^batch plan copies:
    measured 3× slower at batch 5, not faster. Instead the round's
    union dedups to each node's MINIMUM in-round depth (one groupBy)
    and takes ONE anti-join against visited — linear plan growth.
    Shortest-depth and cycle safety are preserved exactly: a node
    re-reached within the round keeps its min depth, one already
    visited is anti-joined away, and re-expanding a visited node's
    neighbors inside the round only produces more already-visited
    rows for the same anti-join (the randomized equivalence test pins
    batched ≡ unbatched across uneven batch/depth splits).

    ROUND-14: per-level ``dropDuplicates`` removed by default. Each
    in-round level used to dedup its frontier (a hash-agg Exchange —
    a stage boundary per LEVEL whose scheduling latency was, per the
    soak, this query's entire cost); the round's min-depth groupBy is
    the only dedup now, so a round of b levels pays b broadcast
    joins + ONE shuffle instead of b of each (planted-geometry A/B:
    0.62× on the bench fixture, identical rows on chain / diamond /
    tree / fixture — scripts/probe3_r14.py). The per-level dedup was
    also the safety bound against in-round PATH-MULTIPLICITY blowup
    (a node reachable via k in-round paths now produces k rows that
    keep multiplying through deeper levels — 2^levels on stacked
    diamonds), so the round's stats action additionally sums per-node
    in-round path counts: when duplication (paths/nodes) exceeds
    ``dedup_guard_factor`` the remaining rounds — the geometrically
    LARGER ones — fall back to per-level dedup. Geometric batching
    makes the guard cheap and early: diamond density is detected in
    the small rounds (≤9 levels) before the large rounds could
    amplify it; the residual exposure is one round (≤
    ``levels_per_round·2^rounds`` levels) of duplication on a graph
    whose diamonds first appear past the guarded rounds — bounded by
    the depth cap, and only ever a cost concern, never correctness
    (the round's groupBy collapses multiplicity before any row leaves
    the round; the guard changes WHERE dedup happens, never what the
    round emits).
    """
    edges = asset_links.filter(
        F.col("relationship_type") == "parentChild"
    ).select(
        F.col("from_database_id").alias("src_db"),
        F.col("from_asset_id").alias("src_id"),
        F.col("to_database_id").alias("dst_db"),
        F.col("to_asset_id").alias("dst_id"),
    )
    # the edge relation is re-scanned once per BFS level: materialize it
    # once (its derivation — view SQL + parquet scan — is the per-level
    # fixed cost otherwise; at depth d that's d redundant scans)
    edges = edges.persist()
    spark = asset_links.sparkSession
    frontier = spark.createDataFrame(
        [(database_id, asset_id, 0)], "database_id string, asset_id string, depth int"
    )
    visited = frontier

    def step(f: DataFrame, depth: int, dedup: bool) -> DataFrame:
        out = (
            F.broadcast(f)
            .join(
                edges,
                (f["database_id"] == edges["src_db"])
                & (f["asset_id"] == edges["src_id"]),
            )
            .select(
                F.col("dst_db").alias("database_id"),
                F.col("dst_id").alias("asset_id"),
                F.lit(depth).alias("depth"),
            )
        )
        if dedup:
            # guard-triggered only: dedup each level's frontier (the
            # hash-agg Exchange is the stage boundary the dedup-free
            # path exists to avoid); the post-shuffle coalesce(1)
            # kills the 32-empty-task overhead each level would pay
            out = out.dropDuplicates(["database_id", "asset_id"]).coalesce(1)
        return out

    depth = 0
    rounds = 0
    per_level_dedup = False
    try:
        while depth < max_depth:
            # geometric growth: round r expands levels_per_round·2^r
            # levels, so a diameter-D expansion costs O(log D) driver
            # rounds instead of D/batch (the soak pinned per-round
            # latency as this query's ENTIRE cost). Overshooting the
            # true depth wastes only joins against empty frontiers,
            # executed inside the same single action; the plan the
            # round's checkpoint cuts stays linear in its batch size.
            batch = min(
                max(1, levels_per_round) * (2 ** rounds),
                max_depth - depth,
            )
            g = frontier
            acc: DataFrame | None = None
            for i in range(1, batch + 1):
                g = step(g, depth + i, per_level_dedup)
                acc = g if acc is None else acc.unionByName(g)
            nxt = (
                acc.groupBy("database_id", "asset_id")
                .agg(
                    F.min("depth").alias("depth"),
                    # in-round path multiplicity, read by the guard in
                    # the SAME stats action the exits already pay for
                    F.count(F.lit(1)).alias("_paths"),
                )
                .join(
                    visited.select("database_id", "asset_id"),
                    ["database_id", "asset_id"],
                    "left_anti",
                )
                .coalesce(1)
            )
            if use_checkpoint:
                nxt = nxt.transform(maybe_checkpoint)
            # ONE bounded action decides BOTH exits: total new nodes
            # (loop done) and the round's deepest new depth. Only the
            # round's DEEPEST layer can still have unexplored
            # neighbors (shallower new nodes were expanded in-round) —
            # when it produced nothing, break NOW rather than let the
            # next round discover it: with geometric batching the
            # wasted round would be the largest one (2× this round's
            # levels of empty joins). Folding the max into the same
            # 1-row aggregate makes the early exit FREE in the
            # non-checkpoint path too — the old separate
            # frontier.isEmpty() probe re-executed the round's whole
            # chained-join lineage there, which cost more than the
            # empty round it saved (so it used to be checkpoint-gated,
            # and the non-checkpoint path paid the full extra round).
            stats = nxt.agg(
                F.count(F.lit(1)).alias("n"),
                F.max("depth").alias("deepest"),
                F.sum("_paths").alias("paths"),
            ).collect()[0]
            if stats["n"] == 0:
                break
            if (
                not per_level_dedup
                and stats["paths"] is not None
                and stats["paths"] > dedup_guard_factor * stats["n"]
            ):
                per_level_dedup = True
            nxt = nxt.select("database_id", "asset_id", "depth")
            visited = visited.unionByName(nxt)
            frontier = nxt.filter(F.col("depth") == depth + batch)
            depth += batch
            rounds += 1
            if depth < max_depth and stats["deepest"] < depth:
                break
    finally:
        edges.unpersist()
    # exclude the root itself (the reference returns the subtree below it)
    return visited.filter(F.col("depth") > 0)




def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="probe-r15-desc")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)
    links = t["asset_links"]

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    a = rows(old_descendants(links, "db_8", "asset_48"))
    b = rows(descendants(links, "db_8", "asset_48"))
    assert a == b, (len(a), len(b))
    print(f"equality gate PASSED: {len(a)} rows", flush=True)

    times = {"old": [], "new": []}
    arms = {
        "old": lambda: old_descendants(links, "db_8", "asset_48").collect(),
        "new": lambda: descendants(links, "db_8", "asset_48").collect(),
    }
    for i in range(runs):
        for label, fn in arms.items():
            spark.sparkContext.setJobDescription(f"desc-ab:{label}:{i}")
            t0 = time.time()
            fn()
            times[label].append(time.time() - t0)
    for label, xs in times.items():
        print(
            f"{label}: min={min(xs):.3f} med={statistics.median(xs):.3f} "
            f"all={[round(x, 3) for x in xs]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
