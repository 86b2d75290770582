#!/usr/bin/env python
"""Round-15 probe: single-scan mutated-twin derivation A/B.

Several doc-pipeline queries build their corpus as
``docs.unionByName(mutated)`` where ``mutated`` re-derives from a
SECOND scan of documents (tokenize + truncate) — documents is read and
split twice. Arm NEW derives both variants from ONE scan: per row,
explode a 2-element array of (original, mutated) structs, computing
the token split once. Row order differs (interleaved vs concatenated)
but every consumer aggregates/sorts, so results must be identical —
asserted before timing.

Probes the heaviest user, q_doc_setsim_join (full query timed), and
q_ngram_jaccard_topk.

Usage: python scripts/probe_r15_variants.py [runs]
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
from visual_asset_management_system_spark.operators.dedup import (  # noqa: E402
    setsim_join,
    word_shingles,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def both_variants(docs):
    """docs + the last-5-tokens-dropped twin (id + 1e6) from ONE scan."""
    toks = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda tok: tok != ""
    )
    mut_text = F.concat_ws(
        " ", F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(1)))
    )
    return docs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_id").alias("doc_id"), F.col("text").alias("text")
                ),
                F.struct(
                    (F.col("doc_id") + 1000000).alias("doc_id"),
                    mut_text.alias("text"),
                ),
            )
        ).alias("v")
    ).select("v.doc_id", "v.text")


def setsim_new(spark):
    t = Q.tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text")
    shingled = (
        both_variants(docs)
        .select(
            "doc_id",
            F.array_sort(word_shingles(F.lower(F.col("text")), 3)).alias("g"),
        )
        .filter(F.size("g") > 0)
    )
    reps = shingled.groupBy("g").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("members"),
    )
    pairs = setsim_join(reps, threshold=0.9, items_col="g")
    m = reps.select("doc_id", "members")
    return (
        pairs.join(
            m.withColumnRenamed("members", "members_a"), pairs.id_a == m.doc_id
        )
        .drop("doc_id")
        .join(
            reps.select(
                F.col("doc_id").alias("_b"), F.col("members").alias("members_b")
            ),
            F.col("id_b") == F.col("_b"),
        )
        .select(
            "id_a", "id_b", "overlap", "n_a", "n_b", "jaccard",
            "members_a", "members_b",
        )
        .orderBy("id_a", "id_b")
    )


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="probe-r15-variants")
    spark.sparkContext.setLogLevel("ERROR")

    def arm_old():
        return Q.QUERIES["q_doc_setsim_join"](spark, SF_DIR)

    def arm_new():
        return setsim_new(spark)

    ref = [tuple(r) for r in arm_old().collect()]
    got = [tuple(r) for r in arm_new().collect()]
    assert got == ref, f"ARMS DIFFER: {len(got)} vs {len(ref)} rows"
    print(f"equality gate PASSED: {len(ref)} identical rows", flush=True)

    times = {"old": [], "new": []}
    for i in range(runs):
        for label, arm in (("old", arm_old), ("new", arm_new)):
            spark.sparkContext.setJobDescription(f"variants-ab:{label}:{i}")
            t0 = time.time()
            arm().write.format("noop").mode("overwrite").save()
            times[label].append(time.time() - t0)
    for label in ("old", "new"):
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
