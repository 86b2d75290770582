#!/usr/bin/env python
"""Round-14 optimization probe: decompose the slowest bench queries
into sub-stage timings (noop sink, best-of-2) so the optimization
targets the stage that actually costs, per the measure-first
discipline. Read-only: no engine changes, no artifacts — prints a
timing table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from visual_asset_management_system_spark import queries as Q  # noqa: E402
from visual_asset_management_system_spark.operators import checkpointing  # noqa: E402
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, runs=2):
    best = None
    calls0 = checkpointing.CALLS
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    ckpts = (checkpointing.CALLS - calls0) // runs
    print(f"{label:55s} {best:7.3f}s  ckpt_calls/run={ckpts}", flush=True)
    return best


def main():
    spark = get_spark(app_name="probe-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)
    t["search_assets"].count()
    t["search_files"].count()
    postings, stats = Q.asset_inverted_index(t, SF_DIR)
    postings.count(); stats.count()
    Q._bucketed_embeddings(spark, SF_DIR).count()

    # ---- full-query references (warm, noop) -------------------------
    for name in [
        "q_corpus_build_v2", "q_corpus_build", "q_doc_setsim_join",
        "q_vams_pagerank", "q_vams_descendants", "q_ngram_jaccard_topk",
        "q_minhash_pairs", "q_pipeline_preprocess", "q_embedding_semdedup",
        "q_vams_related_components",
    ]:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        Q.QUERIES[name](spark, SF_DIR).collect()  # warm codegen
        timed(f"FULL {name}", lambda n=name: Q.QUERIES[n](spark, SF_DIR).collect())

    # ---- corpus_build_v2 decomposition ------------------------------
    from visual_asset_management_system_spark.operators.checkpointing import (
        maybe_checkpoint,
    )
    from visual_asset_management_system_spark.operators.corpus import (
        contamination, dedup_lines, pack_sequences,
    )
    from visual_asset_management_system_spark.operators.dedup import (
        drop_exact_duplicates,
    )
    from visual_asset_management_system_spark.operators.partitioning import (
        ensure_min_parallelism,
    )
    from visual_asset_management_system_spark.operators.text import (
        gopher_repetition_signals,
    )

    docs = t["documents"].select(
        "doc_id", F.replace("text", F.lit(" table "), F.lit("\n")).alias("text")
    )
    sig = gopher_repetition_signals(F.col("text"))
    staged = (
        ensure_min_parallelism(docs)
        .withColumn("lang_pred", Q.lang_id(F.col("text")))
        .withColumn("quality", Q.quality_score(F.col("text")))
        .withColumn("dup_line_frac", sig["dup_line_frac"])
        .filter(
            (F.col("lang_pred") == "en")
            & (F.col("quality") >= 0.5)
            & (F.col("dup_line_frac") <= 0.5)
        )
        .select("doc_id", "text")
    )
    spark.sparkContext.setJobDescription("probe:v2-decomp")
    noop(staged)
    timed("v2: staged filter stack (noop)", lambda: noop(staged))
    timed("v2: maybe_checkpoint(staged)", lambda: maybe_checkpoint(staged))
    st = maybe_checkpoint(staged)
    rewritten = (
        dedup_lines(st, min_docs=2).filter(F.col("text") != "")
        .select("doc_id", "text")
    )
    timed("v2: dedup_lines(st) (noop)", lambda: noop(rewritten))
    timed(
        "v2: +drop_exact_dups ckpt",
        lambda: maybe_checkpoint(
            ensure_min_parallelism(drop_exact_duplicates(rewritten))
        ),
    )
    deduped = maybe_checkpoint(
        ensure_min_parallelism(drop_exact_duplicates(rewritten))
    )
    bench = deduped.filter(F.col("doc_id") % 11 == 0)
    train = deduped.filter(F.col("doc_id") % 11 != 0)
    dirty = contamination(train, bench, n=8, min_overlap=3).select("doc_id")
    clean = train.join(dirty, "doc_id", "left_anti")
    timed("v2: contamination+anti (noop)", lambda: noop(clean))
    packed = pack_sequences(
        clean, seq_len=512, n_buckets=8,
        bucket_col=F.pmod(F.col("doc_id"), F.lit(8)),
    ).select("doc_id", "bucket", "n_tokens", "seq_id", "offset")
    timed("v2: +pack_sequences (noop)", lambda: noop(packed))

    # ---- pagerank marginal cost per iteration ------------------------
    from visual_asset_management_system_spark.operators.graph import (
        descendants, pagerank,
    )

    edges = t["asset_links"].select(
        F.concat_ws("/", "from_database_id", "from_asset_id").alias("src"),
        F.concat_ws("/", "to_database_id", "to_asset_id").alias("dst"),
    )
    spark.sparkContext.setJobDescription("probe:pagerank")
    for iters in (2, 4, 10):
        timed(
            f"pagerank iters={iters}",
            lambda i=iters: pagerank(edges, iters=i).collect(),
        )
    timed(
        "pagerank iters=10 ckpt_every=4",
        lambda: pagerank(edges, iters=10, checkpoint_every=4).collect(),
    )
    timed(
        "pagerank iters=10 ckpt_every=1",
        lambda: pagerank(edges, iters=10, checkpoint_every=1).collect(),
    )

    # ---- descendants variants ----------------------------------------
    spark.sparkContext.setJobDescription("probe:descendants")
    for lpr in (3, 6, 12):
        timed(
            f"descendants levels_per_round={lpr}",
            lambda b=lpr: descendants(
                t["asset_links"], "db_8", "asset_48", levels_per_round=b
            ).orderBy("depth", "database_id", "asset_id").collect(),
        )
    timed(
        "descendants lpr=3 no_checkpoint",
        lambda: descendants(
            t["asset_links"], "db_8", "asset_48", use_checkpoint=False
        ).orderBy("depth", "database_id", "asset_id").collect(),
    )

    # ---- setsim: candidates vs verification --------------------------
    from visual_asset_management_system_spark.operators.dedup import (
        setsim_candidates, setsim_join, word_shingles,
    )

    docs2 = t["documents"].select("doc_id", "text")
    toks = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda tok: tok != ""
    )
    mutated = docs2.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(1)))
        ).alias("text"),
    )
    shingled = (
        docs2.unionByName(mutated)
        .select(
            "doc_id",
            F.array_sort(word_shingles(F.lower(F.col("text")), 3)).alias("g"),
        )
        .filter(F.size("g") > 0)
    )
    reps = shingled.groupBy("g").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("members")
    )
    spark.sparkContext.setJobDescription("probe:setsim")
    noop(reps)
    timed("setsim: shingle+reps (noop)", lambda: noop(reps))
    cands = setsim_candidates(reps, threshold=0.9, items_col="g")
    noop(cands)
    timed("setsim: candidates (noop)", lambda: noop(cands))
    full = setsim_join(reps, threshold=0.9, items_col="g")
    timed("setsim: full join (noop)", lambda: noop(full))

    # ---- minhash: signatures vs candidates vs verify ------------------
    from visual_asset_management_system_spark.operators.dedup import (
        minhash_lsh_candidates, minhash_signatures,
    )

    corpus = docs2.unionByName(
        docs2.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    spark.sparkContext.setJobDescription("probe:minhash")
    sigs = minhash_signatures(corpus, num_hashes=64)
    noop(sigs)
    timed("minhash: signatures (noop)", lambda: noop(sigs))
    mc = minhash_lsh_candidates(corpus, num_hashes=64, bands=16)
    noop(mc)
    timed("minhash: lsh candidates (noop)", lambda: noop(mc))

    spark.stop()


if __name__ == "__main__":
    main()
