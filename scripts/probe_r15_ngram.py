#!/usr/bin/env python
"""Round-15 probe: ngram/minhash family decomposition + int64 verify
encode A/B (the r14 verdict's item 4).

Context: within each query the signature stage is ALREADY shared
(minhash_dedup checkpoints `sig` for banding + both verify sides;
minhash_lsh_candidates checkpoints it for the band self-join), and a
CROSS-query shared signature stage would be result caching across
bench entries — banned. What remains testable: (a) decompose
q_ngram_jaccard_topk / q_minhash_pairs to confirm which stage pays,
(b) A/B a dictionary-encoded (int64) verification for
ngram_jaccard_pairs — the same §2.3 narrow-bytes lever that ships for
setsim behind the size crossover — with asserted bit-equality.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from visual_asset_management_system_spark import queries as Q  # noqa: E402
from visual_asset_management_system_spark.operators.checkpointing import (  # noqa: E402
    maybe_checkpoint,
)
from visual_asset_management_system_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    word_shingles,
)
from visual_asset_management_system_spark.operators.partitioning import (  # noqa: E402
    ensure_min_parallelism,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, runs=3):
    xs = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        xs.append(time.time() - t0)
    print(
        f"{label:48s} min={min(xs):.3f} med={statistics.median(xs):.3f}",
        flush=True,
    )


def encoded_ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """ngram_jaccard_pairs with the pruned docs' shingles dictionary-
    encoded to int64 before the pair join (bijective -> intersection
    and union sizes identical; jaccard bit-equal)."""
    candidates = candidates.transform(maybe_checkpoint)
    ids = (
        candidates.select(F.col("id_a").alias("id"))
        .unionByName(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    exploded = (
        ensure_min_parallelism(df)
        .join(ids, F.col(id_col) == ids["id"], "left_semi")
        .select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"),
        )
    )
    vocab = exploded.select("s").distinct().select(
        "s", F.row_number().over(Window.orderBy("s")).alias("tid")
    )
    sh = (
        exploded.join(vocab, "s")
        .groupBy("id")
        .agg(F.collect_list("tid").alias("sh"))
        .withColumn("n_sh", F.size("sh"))
        .transform(maybe_checkpoint)
    )
    sh_a = (
        sh.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a")
        .withColumnRenamed("n_sh", "n_a")
    )
    sh_b = (
        sh.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b")
        .withColumnRenamed("n_sh", "n_b")
    )
    return (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("_i", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("_i") / (F.col("n_a") + F.col("n_b") - F.col("_i")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def main():
    spark = get_spark(app_name="probe-r15-ngram")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text")
    toks = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda tok: tok != ""
    )
    mutated = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(1)))
        ).alias("text"),
    )
    corpus = docs.unionByName(mutated)

    # ---- decomposition ------------------------------------------------
    spark.sparkContext.setJobDescription("probe15:ngram-decomp")
    sigs = minhash_signatures(corpus, num_hashes=64)
    noop(sigs)
    timed("ngram: signatures (noop)", lambda: noop(sigs))
    cands = minhash_lsh_candidates(corpus, num_hashes=64, bands=16)
    noop(cands)
    timed("ngram: lsh candidates (noop)", lambda: noop(cands))
    full = Q.QUERIES["q_ngram_jaccard_topk"]
    full(spark, SF_DIR).collect()
    timed("ngram: FULL query", lambda: full(spark, SF_DIR).collect())
    fullmh = Q.QUERIES["q_minhash_pairs"]
    fullmh(spark, SF_DIR).collect()
    timed("minhash_pairs: FULL query", lambda: fullmh(spark, SF_DIR).collect())

    # ---- verify-stage A/B: string vs dictionary-encoded ---------------
    spark.sparkContext.setJobDescription("probe15:ngram-verify-ab")
    c = minhash_lsh_candidates(corpus, num_hashes=64, bands=16).transform(
        maybe_checkpoint
    )
    ref = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(corpus, c, threshold=0.9).collect()
    )
    enc = sorted(
        tuple(r)
        for r in encoded_ngram_jaccard_pairs(
            corpus, c, threshold=0.9
        ).collect()
    )
    assert ref == enc, f"verify arms differ: {len(ref)} vs {len(enc)}"
    print(f"verify equality gate PASSED: {len(ref)} pairs", flush=True)
    for i in range(3):
        for label, fn in (
            ("verify:string", lambda: noop(
                ngram_jaccard_pairs(corpus, c, threshold=0.9))),
            ("verify:int64", lambda: noop(
                encoded_ngram_jaccard_pairs(corpus, c, threshold=0.9))),
        ):
            t0 = time.time()
            fn()
            print(f"{label} run{i}: {time.time() - t0:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
