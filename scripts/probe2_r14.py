#!/usr/bin/env python
"""Round-14 probe #2: prototype loop restructures for the iterative
graph operators and A/B them against the shipped implementations —
asserting IDENTICAL results before any engine edit.

1. pagerank_v2: loop-invariant e*outdeg join hoisted + dangling mass
   via a static has_out flag (filter-agg instead of per-iteration
   anti-join).
2. connected_components_v2: per-round change detection carried as a
   column (computed in the same join that builds the new labels)
   instead of a separate nxt-vs-labels join per round.
3. descendants batching variants (geometric base / cap).
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
    connected_components, descendants, pagerank,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pagerank_v2(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    round_digits: int = 6,
    checkpoint_every: int = 2,
) -> DataFrame:
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # loop-invariant: contribution denominators attached ONCE
    eo = maybe_checkpoint(e.join(outdeg, "src"))
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .join(
            outdeg.select(F.col("src").alias("node"), F.lit(True).alias("_o")),
            "node",
            "left",
        )
        .select("node", F.col("_o").isNotNull().alias("has_out"))
        .transform(maybe_checkpoint)
    )
    n = nodes.count()
    teleport = (1.0 - damping) / n
    n_f = float(n)
    ranks = nodes.select("node", "has_out", F.lit(1.0 / n).alias("rank"))
    for it in range(iters):
        contribs = eo.join(ranks, eo["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("outdeg")).alias("c"),
        )
        gathered = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,18)")).cast("double").alias("s")
        )
        dang = ranks.filter(~F.col("has_out")).agg(
            F.coalesce(
                F.sum(F.col("rank").cast("decimal(38,18)")).cast("double"),
                F.lit(0.0),
            ).alias("dang")
        )
        ranks = (
            nodes.join(gathered, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "has_out",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dang") / F.lit(n_f)
                    )
                ).alias("rank"),
            )
        )
        if (it + 1) % max(1, checkpoint_every) == 0 or it == iters - 1:
            ranks = ranks.transform(maybe_checkpoint)
    return ranks.select("node", F.round("rank", round_digits).alias("rank"))


def connected_components_v2(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.unionByName(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .transform(maybe_checkpoint)
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("label").alias("_nmin"))
            )
            jump = (
                labels.alias("l1")
                .join(
                    labels.alias("l2"),
                    F.col("l1.label") == F.col("l2.node"),
                )
                .select(
                    F.col("l1.node").alias("node"),
                    F.col("l2.label").alias("_jmin"),
                )
            )
            nxt = (
                labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
                .select("node", "label", "_nmin")
                .join(jump, "node")
                .select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("_nmin"), F.col("label")),
                        F.col("_jmin"),
                    ).alias("label"),
                    # change flag computed HERE: the old label is in scope,
                    # so no separate nxt-vs-labels join is needed per round
                    (
                        F.least(
                            F.col("label"),
                            F.coalesce(F.col("_nmin"), F.col("label")),
                            F.col("_jmin"),
                        )
                        != F.col("label")
                    ).alias("_changed"),
                )
                .transform(maybe_checkpoint)
            )
            no_change = nxt.filter(F.col("_changed")).isEmpty()
            labels = nxt.select("node", "label")
            if no_change:
                break
        return labels.withColumnRenamed("label", "component")
    finally:
        sym.unpersist()


def timed(label, fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best:7.3f}s", flush=True)
    return best


def main():
    spark = get_spark(app_name="probe2-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)

    edges = t["asset_links"].select(
        F.concat_ws("/", "from_database_id", "from_asset_id").alias("src"),
        F.concat_ws("/", "to_database_id", "to_asset_id").alias("dst"),
    )

    # --- equality check: pagerank_v2 vs pagerank ----------------------
    a = sorted(
        (r["node"], r["rank"]) for r in pagerank(edges).collect()
    )
    b = sorted(
        (r["node"], r["rank"]) for r in pagerank_v2(edges).collect()
    )
    print(f"pagerank_v2 equality: {a == b} ({len(a)} rows)", flush=True)
    timed("pagerank v1", lambda: pagerank(edges).collect())
    timed("pagerank v2", lambda: pagerank_v2(edges).collect())

    # --- equality check: components_v2 vs components ------------------
    und = t["asset_links"].select(
        F.col("from_asset_id").alias("src"), F.col("to_asset_id").alias("dst")
    )
    ca = sorted(
        (r["node"], r["component"]) for r in connected_components(und).collect()
    )
    cb = sorted(
        (r["node"], r["component"])
        for r in connected_components_v2(und).collect()
    )
    print(f"components_v2 equality: {ca == cb} ({len(ca)} rows)", flush=True)
    timed("components v1", lambda: connected_components(und).collect())
    timed("components v2", lambda: connected_components_v2(und).collect())

    # --- descendants: where do the rounds go? -------------------------
    res = descendants(t["asset_links"], "db_8", "asset_48").collect()
    depths = sorted({r["depth"] for r in res})
    print(
        f"descendants fixture: {len(res)} rows, max depth {max(depths)}, "
        f"depth histogram {[(d, sum(1 for r in res if r['depth'] == d)) for d in depths]}",
        flush=True,
    )
    for lpr in (1, 2, 3):
        timed(
            f"descendants lpr={lpr}",
            lambda b=lpr: descendants(
                t["asset_links"], "db_8", "asset_48", levels_per_round=b
            ).orderBy("depth", "database_id", "asset_id").collect(),
        )
    timed(
        "descendants max_depth=exact(8)",
        lambda: descendants(
            t["asset_links"], "db_8", "asset_48", max_depth=8
        ).orderBy("depth", "database_id", "asset_id").collect(),
    )

    spark.stop()


if __name__ == "__main__":
    main()
