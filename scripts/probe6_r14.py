#!/usr/bin/env python
"""Round-14 probe #6: let-binding for the interpreted-HOF text
expressions. Interpreted lambdas get NO cross-reference subexpression
elimination — every reference to a non-cheap array subtree re-evaluates
it (distinct lambda variable ids defeat CSE). The executed plans show:

- standalone lang_id: the marker-hits filter (and the split under it)
  appears EIGHT times per row (4 per-language entries x 2 references
  to the argmax struct);
- quality_score standalone: the token array 3x;
- bpe_token_estimate: the punctuation split twice (size + aggregate).

The let-idiom binds a value once per row inside one Column expression:
element_at(transform(array(v), body), 1) — body's lambda variable IS
the bound value. The BPE estimate instead fuses count+correction into
ONE aggregate fold.

A/B (interleaved, noop sink) against the shipped operators, equality
asserted on exact collected output first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F  # noqa: E402

from visual_asset_management_system_spark import queries as Q  # noqa: E402
from visual_asset_management_system_spark.operators.partitioning import (  # noqa: E402
    ensure_min_parallelism,
)
from visual_asset_management_system_spark.operators.text import (  # noqa: E402
    LANG_MARKERS, STOPWORDS, bpe_token_estimate, lang_id, quality_score,
    tokens,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _let(value: Column, body) -> Column:
    return F.element_at(F.transform(F.array(value), body), 1)


def _marker_filter(markers):
    def pred(t):
        return t.isin(*markers)

    return pred


def lang_id_let(text: Column, ltoks: Column | None = None) -> Column:
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    src = ltoks if ltoks is not None else tokens(F.lower(text))
    langs = sorted(LANG_MARKERS)
    lang_by_rank = F.array(*[F.lit(lang) for lang in langs])

    def from_hits(hits):
        entries = [
            F.struct(
                F.size(
                    F.filter(hits, _marker_filter(LANG_MARKERS[lang]))
                ).alias("c"),
                F.lit(-i).alias("neg_rank"),
            )
            for i, lang in enumerate(langs)
        ]

        def from_best(best):
            return F.when(
                best["c"] > 0, F.element_at(lang_by_rank, -best["neg_rank"] + 1)
            ).otherwise(F.lit("und"))

        return _let(F.array_max(F.array(*entries)), from_best)

    return _let(F.filter(src, lambda t: t.isin(*all_markers)), from_hits)


def quality_let(text: Column, ltoks: Column | None = None) -> Column:
    def from_toks(toks):
        n = F.length(text)
        n_tok = F.size(toks)
        alpha_ratio = F.regexp_count(text, F.lit(r"[A-Za-z]")) / F.greatest(
            n, F.lit(1)
        )
        stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
        stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
        mean_word_len = n / F.greatest(n_tok, F.lit(1))
        length_ok = F.when((n >= 50) & (n <= 100000), 1.0).otherwise(0.0)
        word_len_ok = F.when(
            (mean_word_len >= 3) & (mean_word_len <= 12), 1.0
        ).otherwise(0.0)
        return F.round(
            0.25 * length_ok
            + 0.25 * alpha_ratio
            + 0.25 * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
            + 0.25 * word_len_ok,
            4,
        )

    if ltoks is not None:
        return from_toks(ltoks)
    return _let(tokens(F.lower(text)), from_toks)


def bpe_onepass(text: Column) -> Column:
    words = F.filter(
        F.split(F.trim(text), r"[\s\.,;:!\?\(\)\[\]\{\}\"']+"),
        lambda t: t != "",
    )
    return F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.lit(1).cast("bigint")
        + F.when(
            F.length(w) > 4, F.floor(F.length(w) / 4).cast("bigint") - 1
        ).otherwise(F.lit(0).cast("bigint")),
    )


def main():
    spark = get_spark(app_name="probe6-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text")

    # ---- variants ----------------------------------------------------
    def doclang_cur():
        return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))

    def doclang_let():
        return docs.select(
            "doc_id", lang_id_let(F.col("text")).alias("lang_pred")
        )

    def docstats_cur():
        txt = F.col("text")
        return (
            ensure_min_parallelism(docs)
            .withColumn("_lt", tokens(F.lower(txt)))
            .select(
                "doc_id",
                F.size("_lt").cast("bigint").alias("n_tokens"),
                bpe_token_estimate(txt).cast("bigint").alias("bpe_tokens"),
                quality_score(txt, F.col("_lt")).alias("quality"),
            )
        )

    def docstats_new():
        txt = F.col("text")
        return (
            ensure_min_parallelism(docs)
            .withColumn("_lt", tokens(F.lower(txt)))
            .select(
                "doc_id",
                F.size("_lt").cast("bigint").alias("n_tokens"),
                bpe_onepass(txt).cast("bigint").alias("bpe_tokens"),
                quality_let(txt, F.col("_lt")).alias("quality"),
            )
        )

    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )

    def staged_cur():
        return (
            ensure_min_parallelism(doubled)
            .withColumn("_lt", tokens(F.lower(F.col("text"))))
            .withColumn("lang_pred", lang_id(F.col("text"), F.col("_lt")))
            .withColumn("quality", quality_score(F.col("text"), F.col("_lt")))
            .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
            .withColumn("n_tokens", F.size("_lt").cast("int"))
            .withColumn("bpe_tokens", bpe_token_estimate(F.col("text")))
            .drop("_lt")
        )

    def staged_new():
        return (
            ensure_min_parallelism(doubled)
            .withColumn("_lt", tokens(F.lower(F.col("text"))))
            .withColumn("lang_pred", lang_id_let(F.col("text"), F.col("_lt")))
            .withColumn("quality", quality_let(F.col("text"), F.col("_lt")))
            .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
            .withColumn("n_tokens", F.size("_lt").cast("int"))
            .withColumn("bpe_tokens", bpe_onepass(F.col("text")))
            .drop("_lt")
        )

    pairs = {
        "doclang": (doclang_cur, doclang_let),
        "docstats": (docstats_cur, docstats_new),
        "staged(preprocess)": (staged_cur, staged_new),
    }
    for name, (cur, new) in pairs.items():
        a = sorted(tuple(r) for r in cur().collect())
        b = sorted(tuple(r) for r in new().collect())
        print(f"{name} equality: {a == b} ({len(a)} rows)", flush=True)

    for cur, new in pairs.values():
        noop(cur())
        noop(new())
    results: dict[str, list[float]] = {}
    for rnd in range(4):
        for name, (cur, new) in pairs.items():
            for tag, mk in (("cur", cur), ("let", new)):
                spark.sparkContext.setJobDescription(f"probe6:{name}:{tag}:r{rnd}")
                t0 = time.time()
                noop(mk())
                results.setdefault(f"{name}:{tag}", []).append(time.time() - t0)
    for name, xs in results.items():
        fmt = " ".join(f"{x:6.3f}" for x in xs)
        print(f"{name:24s} min={min(xs):6.3f}  runs: {fmt}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
