#!/usr/bin/env python
"""Round-14 probe #3: the descendants per-level dropDuplicates exchange
(OPTIMIZATION_r14.md "Not yet optimized" #1).

Variants, all required to return IDENTICAL (db, id, depth) rows:

- v1: shipped `descendants` (per-level dropDuplicates + coalesce(1)).
- v2: NO per-level dedup — the round's single groupBy(min depth) is the
  only dedup. Risk: in-round path-multiplicity blowup (a node reached
  via k paths produces k rows that keep multiplying downstream).
- v3: v2 plus an adaptive guard: each round's 1-row stats action also
  sums the per-node path counts of the round's new nodes; when the
  duplication factor (paths / nodes) exceeds GUARD_FACTOR the remaining
  rounds (the geometrically LARGER ones) fall back to per-level dedup.

Planted geometries (createDataFrame, deterministic):
- chain(30): single path, zero duplication — dedup is pure overhead;
- diamond ladder(12): 2-wide diamond stacked 12 deep — path count
  doubles per level (4096 paths at the bottom), the blowup case the
  guard exists for;
- tree(b=5, d=5): 3905 descendants, one path each — volume without
  duplication;
plus the bench fixture (db_8/asset_48 at $SPARK_GRAFT_SF_DIR).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from visual_asset_management_system_spark import queries as Q  # noqa: E402
from visual_asset_management_system_spark.operators.checkpointing import (  # noqa: E402
    maybe_checkpoint,
)
from visual_asset_management_system_spark.operators.graph import (  # noqa: E402
    descendants,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GUARD_FACTOR = 4.0


def _descendants_core(
    asset_links: DataFrame,
    database_id: str,
    asset_id: str,
    max_depth: int = 25,
    levels_per_round: int = 3,
    per_level_dedup: bool = False,
    adaptive: bool = False,
) -> DataFrame:
    """v2 (adaptive=False) / v3 (adaptive=True) prototype."""
    edges = asset_links.filter(
        F.col("relationship_type") == "parentChild"
    ).select(
        F.col("from_database_id").alias("src_db"),
        F.col("from_asset_id").alias("src_id"),
        F.col("to_database_id").alias("dst_db"),
        F.col("to_asset_id").alias("dst_id"),
    ).persist()
    spark = asset_links.sparkSession
    frontier = spark.createDataFrame(
        [(database_id, asset_id, 0)],
        "database_id string, asset_id string, depth int",
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
            out = out.dropDuplicates(["database_id", "asset_id"]).coalesce(1)
        return out

    depth = 0
    rounds = 0
    dedup = per_level_dedup
    try:
        while depth < max_depth:
            batch = min(
                max(1, levels_per_round) * (2 ** rounds),
                max_depth - depth,
            )
            g = frontier
            acc: DataFrame | None = None
            for i in range(1, batch + 1):
                g = step(g, depth + i, dedup)
                acc = g if acc is None else acc.unionByName(g)
            nxt = (
                acc.groupBy("database_id", "asset_id")
                .agg(
                    F.min("depth").alias("depth"),
                    F.count(F.lit(1)).alias("_paths"),
                )
                .join(
                    visited.select("database_id", "asset_id"),
                    ["database_id", "asset_id"],
                    "left_anti",
                )
                .coalesce(1)
                .transform(maybe_checkpoint)
            )
            stats = nxt.agg(
                F.count(F.lit(1)).alias("n"),
                F.max("depth").alias("deepest"),
                F.sum("_paths").alias("paths"),
            ).collect()[0]
            if stats["n"] == 0:
                break
            if (
                adaptive
                and not dedup
                and stats["paths"] is not None
                and stats["paths"] > GUARD_FACTOR * stats["n"]
            ):
                dedup = True
            nxt = nxt.select("database_id", "asset_id", "depth")
            visited = visited.unionByName(nxt)
            frontier = nxt.filter(F.col("depth") == depth + batch)
            depth += batch
            rounds += 1
            if depth < max_depth and stats["deepest"] < depth:
                break
    finally:
        edges.unpersist()
    return visited.filter(F.col("depth") > 0)


def descendants_v2(links, db, aid, **kw):
    return _descendants_core(links, db, aid, adaptive=False, **kw)


def descendants_v3(links, db, aid, **kw):
    return _descendants_core(links, db, aid, adaptive=True, **kw)


# ---------------------------------------------------------------- fixtures
def _links(spark, pairs):
    rows = [
        ("db", a, "db", b, "parentChild", f"l{i}")
        for i, (a, b) in enumerate(pairs)
    ]
    return spark.createDataFrame(
        rows,
        "from_database_id string, from_asset_id string, "
        "to_database_id string, to_asset_id string, "
        "relationship_type string, asset_link_id string",
    )


def chain(spark, depth=30):
    return _links(spark, [(f"n{i}", f"n{i+1}") for i in range(depth)])


def diamond_ladder(spark, k=12):
    pairs = []
    for i in range(k):
        pairs += [
            (f"d{i}", f"a{i}"), (f"d{i}", f"b{i}"),
            (f"a{i}", f"d{i+1}"), (f"b{i}", f"d{i+1}"),
        ]
    return _links(spark, pairs)


def tree(spark, b=5, d=5):
    pairs = []
    frontier = ["r"]
    for lvl in range(d):
        nxt = []
        for p in frontier:
            for c in range(b):
                child = f"{p}.{c}"
                pairs.append((p, child))
                nxt.append(child)
        frontier = nxt
    return _links(spark, pairs)


def rows_of(df):
    return sorted(
        (r["database_id"], r["asset_id"], r["depth"]) for r in df.collect()
    )


def timed(label, fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:48s} {best:7.3f}s", flush=True)
    return best


def main():
    spark = get_spark(app_name="probe3-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)

    cases = [
        ("bench fixture", t["asset_links"], "db_8", "asset_48"),
        ("chain(30)", chain(spark), "db", "n0"),
        ("diamond(12)", diamond_ladder(spark), "db", "d0"),
        ("tree(5,5)", tree(spark), "db", "r"),
    ]
    for name, links, db, aid in cases:
        r1 = rows_of(descendants(links, db, aid))
        r2 = rows_of(descendants_v2(links, db, aid))
        r3 = rows_of(descendants_v3(links, db, aid))
        print(
            f"{name}: v2 equal {r1 == r2}, v3 equal {r1 == r3} "
            f"({len(r1)} rows)",
            flush=True,
        )
        assert r1 == r2 and r1 == r3, name

    # interleaved A/B/A/B timing (contention-robust): alternate variants
    for name, links, db, aid in cases:
        print(f"--- {name}", flush=True)
        for rep in range(2):
            timed(f"  v1 shipped   rep{rep}", lambda: descendants(links, db, aid).collect(), runs=1)
            timed(f"  v2 no-dedup  rep{rep}", lambda: descendants_v2(links, db, aid).collect(), runs=1)
            timed(f"  v3 adaptive  rep{rep}", lambda: descendants_v3(links, db, aid).collect(), runs=1)

    spark.stop()


if __name__ == "__main__":
    main()
