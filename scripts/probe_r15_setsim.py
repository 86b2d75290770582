#!/usr/bin/env python
"""Round-15 probe: setsim int64 dictionary encoding A/B.

Arm OLD is the r14 string-keyed `_setsim_stage` + verification copied
inline (frozen); arm NEW is the shipped dictionary-encoded
`setsim_join`. Both arms build the exact q_doc_setsim_join `reps`
input, results are asserted BIT-EQUAL (sorted row tuples) before any
timing is trusted, and runs interleave OLD/NEW within one session so
host drift hits both arms alike (the r14 discipline: raw wall across
sessions on this host is not decision-grade).

Usage: python scripts/probe_r15_setsim.py [runs]
SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
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
    setsim_join,
    word_shingles,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_setsim_join(docs: DataFrame, threshold: float, items_col: str) -> DataFrame:
    """The r14 (pre-dictionary) string-keyed stage, frozen verbatim."""
    from fractions import Fraction

    id_col = "doc_id"
    num, den = (
        Fraction(str(threshold)).numerator,
        Fraction(str(threshold)).denominator,
    )
    items = F.col(items_col)
    toks = maybe_checkpoint(
        docs.select(F.col(id_col), F.explode(items).alias("tok"))
        .filter(F.col("tok").isNotNull())
        .distinct()
    )
    tokdf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy(id_col).orderBy("df", "tok")
    ranked = (
        toks.join(tokdf, "tok")
        .withColumn("pos", F.row_number().over(w_doc))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    need = F.floor((F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den))
    prefix = ranked.filter(F.col("pos") <= F.col("n") - need + 1).select(
        F.col(id_col).alias("pid"), "tok", "pos", F.col("n").alias("pn")
    )
    joined = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .filter(F.col("a.pid") < F.col("b.pid"))
        .filter(
            (F.lit(num) * F.greatest("a.pn", "b.pn"))
            <= (F.lit(den) * F.least("a.pn", "b.pn"))
        )
    )
    cand = joined.select(
        F.col("a.pid").alias("id_a"), F.col("b.pid").alias("id_b")
    ).distinct()
    arrays = toks.groupBy(id_col).agg(
        F.sort_array(F.collect_set("tok")).alias("arr"),
        F.count(F.lit(1)).alias("n"),
    )
    overlap = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = overlap.cast("double") / (
        F.col("n_a") + F.col("n_b") - overlap
    ).cast("double")
    return (
        cand.join(
            arrays.select(
                F.col(id_col).alias("id_a"),
                F.col("arr").alias("arr_a"),
                F.col("n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            arrays.select(
                F.col(id_col).alias("id_b"),
                F.col("arr").alias("arr_b"),
                F.col("n").alias("n_b"),
            ),
            "id_b",
        )
        .filter(jac >= threshold)
        .select(
            "id_a",
            "id_b",
            overlap.cast("bigint").alias("overlap"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def build_reps(spark):
    """The exact q_doc_setsim_join input relation (docs ∪ mutated,
    shingled, identical-set collapse)."""
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
    shingled = (
        docs.unionByName(mutated)
        .select(
            "doc_id",
            F.array_sort(word_shingles(F.lower(F.col("text")), 3)).alias("g"),
        )
        .filter(F.size("g") > 0)
    )
    return shingled.groupBy("g").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("members"),
    )


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="probe-r15-setsim")
    spark.sparkContext.setLogLevel("ERROR")
    reps = build_reps(spark)

    def arm_old():
        return old_setsim_join(reps, 0.9, items_col="g")

    def arm_new():
        return setsim_join(reps, 0.9, items_col="g")

    # equality gate FIRST (also warms codegen for both arms)
    r_old, r_new = rows_of(arm_old()), rows_of(arm_new())
    assert r_old == r_new, (
        f"ARMS DIFFER: old={len(r_old)} rows new={len(r_new)} rows; "
        f"first diff: {next((a, b) for a, b in zip(r_old, r_new) if a != b)}"
    )
    print(f"equality gate PASSED: {len(r_old)} identical pairs", flush=True)

    times = {"old": [], "new": []}
    for i in range(runs):
        for label, arm in (("old", arm_old), ("new", arm_new)):
            spark.sparkContext.setJobDescription(f"setsim-ab:{label}:{i}")
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
        f"speedup (old med / new med): "
        f"{statistics.median(times['old']) / statistics.median(times['new']):.3f}x",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
