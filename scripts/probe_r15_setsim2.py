#!/usr/bin/env python
"""Round-15 probe 2: setsim variants + stage decomposition.

Variants (all asserted bit-equal on the q_doc_setsim_join input):
  old  — r14 string-keyed stage (ckpt toks)
  v1   — shipped dictionary encode (ckpt toks + ckpt enc)
  v2   — dictionary encode, SINGLE checkpoint (enc only)
Decomposition (old arm): ckpt(toks) alone / cand / full.
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

from probe_r15_setsim import build_reps, old_setsim_join, rows_of  # noqa: E402
from visual_asset_management_system_spark.operators.checkpointing import (  # noqa: E402
    maybe_checkpoint,
)
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dict_setsim_join(
    docs: DataFrame, threshold: float, items_col: str, single_ckpt: bool
) -> DataFrame:
    """Dictionary-encoded variant; single_ckpt skips the toks cut."""
    from fractions import Fraction

    id_col = "doc_id"
    num, den = (
        Fraction(str(threshold)).numerator,
        Fraction(str(threshold)).denominator,
    )
    toks = (
        docs.select(F.col(id_col), F.explode(F.col(items_col)).alias("tok"))
        .filter(F.col("tok").isNotNull())
        .distinct()
    )
    if not single_ckpt:
        toks = maybe_checkpoint(toks)
    tokdf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    vocab = tokdf.select(
        "tok", F.row_number().over(Window.orderBy("df", "tok")).alias("tid")
    )
    enc = maybe_checkpoint(
        toks.join(vocab, "tok").select(F.col(id_col), F.col("tid").alias("tok"))
    )
    w_doc = Window.partitionBy(id_col).orderBy("tok")
    ranked = enc.withColumn("pos", F.row_number().over(w_doc)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy(id_col))
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
    arrays = enc.groupBy(id_col).agg(
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


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="probe-r15-setsim2")
    spark.sparkContext.setLogLevel("ERROR")
    reps = build_reps(spark)

    arms = {
        "old": lambda: old_setsim_join(reps, 0.9, items_col="g"),
        "v1": lambda: dict_setsim_join(reps, 0.9, "g", single_ckpt=False),
        "v2": lambda: dict_setsim_join(reps, 0.9, "g", single_ckpt=True),
    }
    ref = None
    for label, arm in arms.items():
        rows = rows_of(arm())
        if ref is None:
            ref = rows
        assert rows == ref, f"{label} DIFFERS: {len(rows)} vs {len(ref)}"
    print(f"equality gate PASSED across {list(arms)}: {len(ref)} pairs")

    # decomposition of the old arm (what dominates?)
    def d_toks():
        docs = reps
        (
            docs.select(F.col("doc_id"), F.explode(F.col("g")).alias("tok"))
            .filter(F.col("tok").isNotNull())
            .distinct()
        ).localCheckpoint(eager=True)

    def d_reps():
        reps.write.format("noop").mode("overwrite").save()

    for label, fn in [("stage:reps_input", d_reps), ("stage:toks_ckpt", d_toks)]:
        xs = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            xs.append(time.time() - t0)
        print(f"{label}: min={min(xs):.3f} all={[round(x,3) for x in xs]}")

    times = {k: [] for k in arms}
    for i in range(runs):
        for label, arm in arms.items():
            spark.sparkContext.setJobDescription(f"setsim-ab2:{label}:{i}")
            t0 = time.time()
            arm().write.format("noop").mode("overwrite").save()
            times[label].append(time.time() - t0)
    for label, xs in times.items():
        print(
            f"{label}: min={min(xs):.3f} med={statistics.median(xs):.3f} "
            f"all={[round(x, 3) for x in xs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
