#!/usr/bin/env python
"""Round-14 probe #5: fuse the lang/quality filter stack's duplicate
tokenization passes and A/B against the shipped stack, asserting
IDENTICAL filtered output before any engine edit.

Shipped stack (one projection): lang_id(text) splits lower(text) on
\\s+, quality_score(text) splits the RAW text on \\s+ — two full-text
regex passes over every document, plus a per-token lower() inside the
stopword filter. Lowercasing never creates or destroys whitespace, so
tokens(lower(text)) is elementwise lower(tokens(text)): one shared
lowered-token array can feed the marker filter, the stopword filter
(dropping its per-token lower()), the token count, and the
mean-word-length denominator. Variant C additionally replaces the
alpha-count length(regexp_replace(text,'[^A-Za-z]','')) with
regexp_count(text,'[A-Za-z]') (no stripped-string allocation).

Interleaved rounds (A,B,C per round) make the comparison
contention-invariant; equality is asserted on the exact filtered
output (doc_id, lang_pred, quality, n_tokens) of the DOUBLED corpus —
the q_pipeline_preprocess staged shape, the heaviest user.
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
    LANG_MARKERS, STOPWORDS, lang_id, quality_score, token_count,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def staged_current(docs):
    return (
        ensure_min_parallelism(docs)
        .withColumn("lang_pred", lang_id(F.col("text")))
        .withColumn("quality", quality_score(F.col("text")))
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .withColumn("n_tokens", token_count(F.col("text")))
    )


def _marker_filter(markers):
    def pred(t):
        return t.isin(*markers)

    return pred


def _fused(docs, alpha_via_count: bool):
    """One shared lowered-token array feeds lang + quality + count."""
    txt = F.col("text")
    ltoks = F.filter(
        F.split(F.trim(F.lower(txt)), r"\s+"), lambda t: t != ""
    )
    base = ensure_min_parallelism(docs).withColumn("_lt", ltoks)

    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    hits = F.filter(F.col("_lt"), lambda t: t.isin(*all_markers))
    langs = sorted(LANG_MARKERS)
    entries = [
        F.struct(
            F.size(F.filter(hits, _marker_filter(LANG_MARKERS[lang]))).alias("c"),
            F.lit(-i).alias("neg_rank"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    lang_by_rank = F.array(*[F.lit(lang) for lang in langs])
    lang_pred = F.when(
        best["c"] > 0, F.element_at(lang_by_rank, -best["neg_rank"] + 1)
    ).otherwise(F.lit("und"))

    n = F.length(txt)
    n_tok = F.size(F.col("_lt"))
    if alpha_via_count:
        alpha_ratio = F.regexp_count(txt, F.lit(r"[A-Za-z]")) / F.greatest(
            n, F.lit(1)
        )
    else:
        alpha_ratio = F.length(
            F.regexp_replace(txt, r"[^A-Za-z]", "")
        ) / F.greatest(n, F.lit(1))
    stop_hits = F.size(F.filter(F.col("_lt"), lambda t: t.isin(*STOPWORDS)))
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    mean_word_len = n / F.greatest(n_tok, F.lit(1))
    length_ok = F.when((n >= 50) & (n <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 12), 1.0
    ).otherwise(0.0)
    quality = F.round(
        0.25 * length_ok
        + 0.25 * alpha_ratio
        + 0.25 * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        + 0.25 * word_len_ok,
        4,
    )
    return (
        base.withColumn("lang_pred", lang_pred)
        .withColumn("quality", quality)
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .withColumn("n_tokens", F.size(F.col("_lt")))
        .drop("_lt")
    )


def main():
    spark = get_spark(app_name="probe5-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )

    cols = ["doc_id", "lang_pred", "quality", "n_tokens"]
    variants = {
        "A_current": lambda: staged_current(doubled).select(*cols),
        "B_fused": lambda: _fused(doubled, alpha_via_count=False).select(*cols),
        "C_fused_rxcount": lambda: _fused(doubled, alpha_via_count=True).select(
            *cols
        ),
    }

    ref = None
    for name, mk in variants.items():
        rows = sorted(tuple(r) for r in mk().collect())
        if ref is None:
            ref = rows
            print(f"{name}: {len(rows)} rows (reference)", flush=True)
        else:
            print(f"{name} equality: {rows == ref} ({len(rows)} rows)", flush=True)

    # warm codegen once per variant, then interleave
    for mk in variants.values():
        noop(mk())
    results = {k: [] for k in variants}
    for rnd in range(4):
        for name, mk in variants.items():
            spark.sparkContext.setJobDescription(f"probe5:{name}:r{rnd}")
            t0 = time.time()
            noop(mk())
            results[name].append(time.time() - t0)
    for name, xs in results.items():
        fmt = " ".join(f"{x:6.3f}" for x in xs)
        print(f"{name:18s} min={min(xs):6.3f}  runs: {fmt}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
