#!/usr/bin/env python
"""Round-14 probe #9: semdedup/near-dup staging rework A/B.

The r14 plan audit left ONE candidate open: q_embedding_semdedup /
q_embedding_near_dup plan SortMergeJoins at compile time because the
`_bucketed_norms` staging relation is an eager localCheckpoint — an
RDD scan with no statistics, so the pre-AQE planner can't prove the
self-join sides broadcastable and plans both Exchanges up front (AQE
converts to BHJ at runtime, but the shuffle-write stages have already
run). Hypothesis: persist()-based staging keeps the lineage (and thus
compile-time size estimates) while still computing the bucket dots +
norm once per vector — the planner then lands BHJ in the INITIAL plan
and the self-join shuffles never execute. At real scale the estimate
exceeds the broadcast threshold and the planner falls back to the SMJ
it lands today, so the change stays scale-adaptive.

Variants (staging wrapper is the ONLY difference — expressions
identical, so results must be bit-identical):
  v1  shipped: eager localCheckpoint (maybe_checkpoint)
  v2  persist(): lazy cache, lineage + stats preserved
  v3  no staging: plain projection, recomputed per consumer

Asserts sorted-row equality of all three on both query shapes, prints
interleaved min-of-N timings and Exchange/SortMergeJoin counts from
the executed (AQE final) plans.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from visual_asset_management_system_spark import queries as Q  # noqa: E402
from visual_asset_management_system_spark.operators import similarity as S  # noqa: E402
from visual_asset_management_system_spark.operators.checkpointing import (  # noqa: E402
    maybe_checkpoint,
)
from visual_asset_management_system_spark.operators.partitioning import (  # noqa: E402
    ensure_min_parallelism,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _staged(embeddings, dim, id_col, vec_col, n_planes, seed):
    """The _bucketed_norms projection WITHOUT any staging wrapper."""
    planes = S._hyperplanes(dim, n_planes, seed)
    return ensure_min_parallelism(embeddings).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        S.lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        S.l2_norm(F.col(vec_col)).alias("nrm"),
    )


def make_variant(kind):
    def _bn(embeddings, dim, id_col, vec_col, n_planes, seed):
        df = _staged(embeddings, dim, id_col, vec_col, n_planes, seed)
        if kind == "ckpt":
            return maybe_checkpoint(df)
        if kind == "persist":
            return df.persist()
        return df  # plain

    return _bn


def semdedup_union_agg(embeddings, dim, id_col="vec_id", vec_col="embedding",
                       n_planes=8, min_cosine=0.9, seed=42,
                       max_bucket_size=None):
    """semdedup with the decision LEFT JOIN replaced by union+aggregate:
    every id contributes its (bucket, dropped=False) row, every pair
    contributes (id_b, NULL, dropped=True), and one hash aggregate per
    id yields the decision — no join, no distinct, one exchange where
    the shipped form plans an SMJ left-side exchange of the corpus plus
    a distinct exchange of the dropped ids."""
    base = S._bucketed_norms(embeddings, dim, id_col, vec_col, n_planes, seed)
    b = base.select(F.col("id").alias(id_col), "bucket")
    pairs = S.pairwise_cosine_within_buckets(
        embeddings, dim, id_col, vec_col, n_planes, min_cosine, seed,
        max_bucket_size, _base=base,
    )
    bucket_t = dict(b.dtypes)["bucket"]
    return (
        b.select(id_col, "bucket", F.lit(False).alias("_d"))
        .unionByName(
            pairs.select(
                F.col("id_b").alias(id_col),
                F.lit(None).cast(bucket_t).alias("bucket"),
                F.lit(True).alias("_d"),
            )
        )
        .groupBy(id_col)
        .agg(F.max("bucket").alias("bucket"), F.max("_d").alias("_dropped"))
        .select(id_col, "bucket", (~F.col("_dropped")).alias("is_kept"))
    )


def corpus_frame(t):
    emb = t["embeddings"].select("vec_id", "embedding")
    scaled = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") * F.lit(2.0)
        ).alias("embedding"),
    )
    return emb.selectExpr(
        "vec_id", "transform(embedding, x -> cast(x as double)) AS embedding"
    ).unionByName(scaled)


def build(kind, corpus, shape):
    stage_kind = "ckpt" if kind == "union_agg" else kind
    orig = S._bucketed_norms
    S._bucketed_norms = make_variant(stage_kind)
    try:
        if shape == "near_dup":
            df = S.pairwise_cosine_within_buckets(
                corpus, dim=Q._EMB_DIM, min_cosine=0.9,
                max_bucket_size=Q._EMB_NEAR_DUP_CAP,
            ).orderBy("id_a", "id_b")
        elif kind == "union_agg":
            df = semdedup_union_agg(
                corpus, dim=Q._EMB_DIM, min_cosine=0.9,
                max_bucket_size=Q._EMB_NEAR_DUP_CAP,
            ).orderBy("vec_id")
        else:
            df = S.semdedup(
                corpus, dim=Q._EMB_DIM, min_cosine=0.9,
                max_bucket_size=Q._EMB_NEAR_DUP_CAP,
            ).orderBy("vec_id")
    finally:
        S._bucketed_norms = orig
    return df


def plan_counts(df):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    return {
        "Exchange": len(re.findall(r"\bExchange\b", p)),
        "SortMergeJoin": len(re.findall(r"SortMergeJoin", p)),
        "BroadcastHashJoin": len(re.findall(r"BroadcastHashJoin", p)),
    }


def main():
    spark = get_spark(app_name="probe9-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)
    corpus = corpus_frame(t)

    only = os.environ.get("PROBE9_KINDS")
    shapes = os.environ.get("PROBE9_SHAPES", "near_dup,semdedup").split(",")
    for shape in shapes:
        kinds = ["ckpt", "persist", "plain"]
        if shape == "semdedup":
            kinds.append("union_agg")
        if only:
            kinds = ["ckpt"] + [
                k for k in only.split(",") if k != "ckpt" and k in kinds
            ]
        rows = {}
        for k in kinds:
            rows[k] = [tuple(r) for r in build(k, corpus, shape).collect()]
            spark.catalog.clearCache()
        for k in kinds[1:]:
            eq = rows["ckpt"] == rows[k]
            print(
                f"{shape}: ckpt=={k} {eq} ({len(rows['ckpt'])} rows)",
                flush=True,
            )
            assert eq, f"{shape}/{k} result mismatch"

        # initial (pre-execution) plan shape per variant
        for k in kinds:
            df = build(k, corpus, shape)
            print(f"  {shape}/{k} initial plan: {plan_counts(df)}", flush=True)
            spark.catalog.clearCache()

        # interleaved timing, min-of-4 rounds
        best = {k: None for k in kinds}
        for _ in range(4):
            for k in kinds:
                t0 = time.time()
                build(k, corpus, shape).collect()
                dt = time.time() - t0
                spark.catalog.clearCache()
                best[k] = dt if best[k] is None else min(best[k], dt)
        for k in kinds:
            print(f"  {shape}/{k:8s} min {best[k]:6.3f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
