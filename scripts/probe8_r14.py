#!/usr/bin/env python
"""Round-14 probe #8: let-bind the line array in gopher_repetition_signals.

Each signal column references `lines = doc_lines(text)` (split +
transform + filter) as a plain subtree; interpreted HOFs get no
cross-reference CSE, so dup_line_frac inlines the split 3x/row and —
worse — dup_line_char_frac's INNER filter (the O(lines^2) duplicate
scan) re-evaluates the split once PER LINE per row. A per-column let
binds the array once: variable lookups thereafter.

Consumers: q_doc_gopher_quality (all four signals projected) and
q_corpus_build_v2's fused gate (dup_line_frac conjunct — 3 splits/row
-> 1 at the pushed filter).

Equality asserted on exact collected output, then interleaved noop-sink
rounds on the delimiter-substituted sf0.1 corpus.
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
    _let,
    doc_lines,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def signals_current(text, delim="\n"):
    # verbatim copy of the shipped gopher_repetition_signals body
    lines = doc_lines(text, delim)
    n = F.size(lines)
    safe_n = F.greatest(n, F.lit(1))
    n_distinct = F.size(F.array_distinct(lines))
    dup_lines = F.filter(
        lines,
        lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1,
    )
    dup_chars = F.aggregate(
        dup_lines, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
    )
    tot_chars = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
    )
    ellipsis = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[\-\*•]"))
    )
    return {
        "dup_line_frac": F.round((n - n_distinct) / safe_n, 6),
        "dup_line_char_frac": F.round(
            dup_chars / F.greatest(tot_chars, F.lit(1)), 6
        ),
        "ellipsis_line_frac": F.round(ellipsis / safe_n, 6),
        "bullet_line_frac": F.round(bullet / safe_n, 6),
    }


def signals_let(text, delim="\n"):
    # candidate: one let-bound line array per signal column
    def dup_line_frac(lines):
        n = F.size(lines)
        return F.round(
            (n - F.size(F.array_distinct(lines))) / F.greatest(n, F.lit(1)), 6
        )

    def dup_line_char_frac(lines):
        dup_lines = F.filter(
            lines,
            lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1,
        )
        dup_chars = F.aggregate(
            dup_lines, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
        )
        tot_chars = F.aggregate(
            lines, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
        )
        return F.round(dup_chars / F.greatest(tot_chars, F.lit(1)), 6)

    def ellipsis_line_frac(lines):
        return F.round(
            F.size(F.filter(lines, lambda l: l.endswith("...") | l.endswith("…")))
            / F.greatest(F.size(lines), F.lit(1)),
            6,
        )

    def bullet_line_frac(lines):
        return F.round(
            F.size(F.filter(lines, lambda l: l.rlike(r"^[\-\*•]")))
            / F.greatest(F.size(lines), F.lit(1)),
            6,
        )

    bind = lambda body: _let(doc_lines(text, delim), body)  # noqa: E731
    return {
        "dup_line_frac": bind(dup_line_frac),
        "dup_line_char_frac": bind(dup_line_char_frac),
        "ellipsis_line_frac": bind(ellipsis_line_frac),
        "bullet_line_frac": bind(bullet_line_frac),
    }


def gopher_shape(docs, mk):
    sig = mk(F.col("text"))
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in sig.items()]
    )


def gate_shape(docs, mk):
    # the corpus_build_v2 staged fragment: fused lang+quality gate AND
    # dup_line_frac conjunct, survivors doc_id/text
    from visual_asset_management_system_spark.operators.text import (
        lang_quality_gate,
    )

    sig = mk(F.col("text"))
    return docs.filter(
        lang_quality_gate(F.col("text")) & (sig["dup_line_frac"] <= 0.5)
    ).select("doc_id", "text")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="probe8-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)
    docs = ensure_min_parallelism(
        t["documents"].select(
            "doc_id",
            F.replace("text", F.lit(" table "), F.lit("\n")).alias("text"),
        )
    )

    shapes = {
        "gopher": gopher_shape,
        "gate": gate_shape,
    }
    for shape, build in shapes.items():
        a = sorted(tuple(r) for r in build(docs, signals_current).collect())
        b = sorted(tuple(r) for r in build(docs, signals_let).collect())
        print(f"{shape} equality: {a == b} ({len(a)} vs {len(b)} rows)",
              flush=True)
        assert a == b

    variants = {
        "gopher_current": lambda: gopher_shape(docs, signals_current),
        "gopher_let": lambda: gopher_shape(docs, signals_let),
        "gate_current": lambda: gate_shape(docs, signals_current),
        "gate_let": lambda: gate_shape(docs, signals_let),
    }
    for mk in variants.values():  # warm codegen once per variant
        noop(mk())
    results = {k: [] for k in variants}
    for rnd in range(4):
        for name, mk in variants.items():
            spark.sparkContext.setJobDescription(f"probe8:{name}:r{rnd}")
            t0 = time.time()
            noop(mk())
            results[name].append(time.time() - t0)
    for name, xs in results.items():
        fmt = " ".join(f"{x:6.3f}" for x in xs)
        print(f"{name:15s} min={min(xs):6.3f}  runs: {fmt}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
