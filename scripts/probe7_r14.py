#!/usr/bin/env python
"""Round-14 probe #7: let-bound single-expression filter gate.

The shipped staged stacks compute lang_pred/quality as columns and
filter on them; the optimizer pushes the Filter below the feature
Project, substituting each feature's tree into the pushed condition —
the executed Filter evaluates the whitespace split 5x per row on EVERY
row (plans/r14/q_pipeline_preprocess_after.txt node (3)), even though
the surviving rows' feature columns share one _lt. A single-expression
boolean gate (lang_quality_gate) can only be MOVED by pushdown, never
duplicated: 1 split/row at the filter.

Two shapes, equality asserted on exact collected output first:
- "build": corpus-build staged stack (survivors keep doc_id/text only —
  the features are dead columns, so the filter is the whole stage);
- "pre": q_pipeline_preprocess staged stack (survivors recompute
  quality/n_tokens from a shared _lt column after the gate).

Interleaved rounds, noop sink, doubled sf0.1 corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from visual_asset_management_system_spark import queries as Q  # noqa: E402
from visual_asset_management_system_spark.operators.partitioning import (  # noqa: E402
    ensure_min_parallelism,
)
from visual_asset_management_system_spark.operators.text import (  # noqa: E402
    bpe_token_estimate,
    lang_id,
    lang_quality_gate,
    quality_score,
    tokens,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_current(docs):
    # the shipped corpus-build staged stack: features as columns, then
    # filter; downstream only uses doc_id/text so the features are dead
    return (
        ensure_min_parallelism(docs)
        .withColumn("_lt", tokens(F.lower(F.col("text"))))
        .withColumn("lang_pred", lang_id(F.col("text"), F.col("_lt")))
        .withColumn("quality", quality_score(F.col("text"), F.col("_lt")))
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .select("doc_id", "text")
    )


def build_gate(docs):
    return ensure_min_parallelism(docs).filter(
        lang_quality_gate(F.col("text"))
    ).select("doc_id", "text")


def pre_current(docs):
    return (
        ensure_min_parallelism(docs)
        .withColumn("_lt", tokens(F.lower(F.col("text"))))
        .withColumn("lang_pred", lang_id(F.col("text"), F.col("_lt")))
        .withColumn("quality", quality_score(F.col("text"), F.col("_lt")))
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .withColumn("n_tokens", F.size("_lt").cast("int"))
        .withColumn("bpe_tokens", bpe_token_estimate(F.col("text")))
        .select("doc_id", "quality", "n_tokens", "bpe_tokens")
    )


def pre_gate(docs):
    return (
        ensure_min_parallelism(docs)
        .filter(lang_quality_gate(F.col("text")))
        .withColumn("_lt", tokens(F.lower(F.col("text"))))
        .withColumn("quality", quality_score(F.col("text"), F.col("_lt")))
        .withColumn("n_tokens", F.size("_lt").cast("int"))
        .withColumn("bpe_tokens", bpe_token_estimate(F.col("text")))
        .select("doc_id", "quality", "n_tokens", "bpe_tokens")
    )


def main():
    spark = get_spark(app_name="probe7-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )

    pairs = {
        "build": (build_current, build_gate),
        "pre": (pre_current, pre_gate),
    }
    for shape, (cur, gate) in pairs.items():
        a = sorted(tuple(r) for r in cur(doubled).collect())
        b = sorted(tuple(r) for r in gate(doubled).collect())
        print(f"{shape} equality: {a == b} ({len(a)} vs {len(b)} rows)",
              flush=True)
        assert a == b

    variants = {
        "build_current": lambda: build_current(doubled),
        "build_gate": lambda: build_gate(doubled),
        "pre_current": lambda: pre_current(doubled),
        "pre_gate": lambda: pre_gate(doubled),
    }
    for mk in variants.values():  # warm codegen once per variant
        noop(mk())
    results = {k: [] for k in variants}
    for rnd in range(4):
        for name, mk in variants.items():
            spark.sparkContext.setJobDescription(f"probe7:{name}:r{rnd}")
            t0 = time.time()
            noop(mk())
            results[name].append(time.time() - t0)
    for name, xs in results.items():
        fmt = " ".join(f"{x:6.3f}" for x in xs)
        print(f"{name:15s} min={min(xs):6.3f}  runs: {fmt}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
