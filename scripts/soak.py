"""sf1 structural soak (VERDICT r9 #2): convert the 100 TB posture
arguments from plan-structure claims into measured scaling evidence.

Runs the heaviest headline queries and the maintained-store update
paths at BOTH /root/testdata/sf0.1 and a 10x scaled analog fixture
(scripts/gen_scaled_fixture.py), in ONE Spark session back-to-back (so
host noise hits both sides roughly equally), and records:

- per-query wall seconds at each SF (best of 2 warm runs) and the
  scaling exponent log10(t_sf1 / t_sf01) — 1.0 = linear, <1 =
  sublinear (fixed overheads amortizing), >1 = superlinear (the thing
  the soak hunts);
- per-query executed-plan structure at sf1 vs the committed sf0.001
  baseline (tests/plan_stats_baseline.json) — scans must not grow;
  exchange DIFFS are recorded (AQE legitimately swaps broadcast/SMJ as
  sides outgrow the broadcast threshold, which changes exchange counts:
  that is a finding to document, not an error);
- store-update paths: second-batch update time at batch sizes scaled
  with the corpus (500 docs against a 4.5k store vs 5k against 45k).

Writes SOAK_r10.json at the repo root.

Usage: python scripts/soak.py [SF1_DIR]   (generate the fixture first)
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SOAK_QUERIES = [
    # 12 heaviest headliners by BENCH_r09 normalized time
    "q_doc_setsim_join",
    "q_vams_descendants",
    "q_corpus_build_v2",
    "q_corpus_build",
    "q_vams_pagerank",
    "q_ngram_jaccard_topk",
    "q_minhash_pairs",
    "q_pipeline_preprocess",
    "q21_waiting_supplier",
    "q_embedding_semdedup",
    "q01_pricing_summary",
    "q05_local_supplier_volume",
]


def _bestof2(fn) -> float:
    ts = []
    for _ in range(2):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(min(ts), 3)


def _store_updates(spark, sf_dir: str, n_docs: int) -> dict[str, float]:
    """Second-batch update time for each maintained store: seed with
    90% of a documents sample, then time one 10% batch."""
    from pyspark.sql import functions as F

    from visual_asset_management_system_spark.operators.corpus import (
        substring_index_update,
    )
    from visual_asset_management_system_spark.operators.dedup import (
        minhash_index_update,
    )
    from visual_asset_management_system_spark.operators.setsim_store import (
        setsim_index_update,
    )
    from visual_asset_management_system_spark.operators.sketches import (
        cms_store_update,
        kmv_store_update,
    )
    from visual_asset_management_system_spark.queries import tables

    from visual_asset_management_system_spark.operators.dedup import (
        word_shingles,
    )

    # deterministic doc_id filter, not limit(n): limit's row selection
    # is order-nondeterministic, so the seed/batch split could deviate
    # from the intended 90/10 and skew the measured exponents
    docs = (
        tables(spark, sf_dir)["documents"]
        .select("doc_id", "text")
        .filter(F.col("doc_id") < n_docs)
    )
    cut = int(n_docs * 0.9)
    seed = docs.filter(F.col("doc_id") < cut)
    batch = docs.filter(F.col("doc_id") >= cut)
    # the setsim item space must be 3-gram shingles, as in
    # q_doc_setsim_join: this corpus's 31-token vocabulary makes every
    # doc's UNIGRAM set nearly identical, so a raw-token setsim at any
    # threshold is a quadratic pair bomb by construction (see the
    # fixture notes) — shingles are the operator's documented contract
    # for it, not a soak-side convenience
    def shingled(df):
        return df.select(
            "doc_id",
            F.array_sort(
                word_shingles(F.lower(F.col("text")), 3)
            ).alias("g"),
        ).filter(F.size("g") > 0)
    out: dict[str, float] = {}
    base = tempfile.mkdtemp(prefix="soak_stores_")

    st = os.path.join(base, "mh")
    minhash_index_update(spark, st, seed, batch_key="b0").count()
    t0 = time.time()
    minhash_index_update(spark, st, batch, batch_key="b1").count()
    out["minhash_update"] = round(time.time() - t0, 3)

    st = os.path.join(base, "sets")
    setsim_index_update(
        spark, st, shingled(seed), threshold=0.9, id_col="doc_id",
        items_col="g", batch_key="b0",
    ).count()
    t0 = time.time()
    setsim_index_update(
        spark, st, shingled(batch), threshold=0.9, id_col="doc_id",
        items_col="g", batch_key="b1",
    ).count()
    out["setsim_update"] = round(time.time() - t0, 3)

    st = os.path.join(base, "sub")
    substring_index_update(spark, st, seed, batch_key="b0").count()
    t0 = time.time()
    substring_index_update(spark, st, batch, batch_key="b1").count()
    out["substring_update"] = round(time.time() - t0, 3)

    ev = tables(spark, sf_dir)["events"].select("user_id")
    st = os.path.join(base, "kmv")
    kmv_store_update(spark, st, ev, "user_id", batch_key="b0")
    st2 = os.path.join(base, "cms")
    t0 = time.time()
    kmv_store_update(spark, st, ev, "user_id", batch_key="b1")
    cms_store_update(spark, st2, ev, "user_id", batch_key="b0")
    out["sketch_updates"] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_vams_sf1"
    sf01_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf1_dir):
        raise SystemExit(
            f"{sf1_dir} missing — run scripts/gen_scaled_fixture.py first"
        )

    from visual_asset_management_system_spark.plans.audit import (
        plan_structure,
        structure_regressions,
    )
    from visual_asset_management_system_spark.queries import QUERIES
    from visual_asset_management_system_spark.session import get_spark

    import bench as bench_mod

    calib_mc = bench_mod._calibrate_mc()
    spark = get_spark(app_name="spark-vams-soak")
    spark.sparkContext.setLogLevel("ERROR")

    with open(os.path.join(REPO, "tests", "plan_stats_baseline.json")) as f:
        baseline = json.load(f)

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("sf0.1", sf01_dir), ("sf1", sf1_dir)):
        # warm-up: session/file-listing/maintained-state costs up front
        QUERIES["q01_pricing_summary"](spark, sf_dir).collect()
        for name in SOAK_QUERIES:
            row = results.setdefault(name, {})
            try:
                sec = _bestof2(
                    lambda: QUERIES[name](spark, sf_dir).collect()
                )
                row[sf_name] = sec
                if sf_name == "sf1":
                    df = QUERIES[name](spark, sf_dir)
                    df.collect()
                    cur = plan_structure(df)
                    row["plan_sf1"] = cur
                    row["structure_vs_baseline"] = structure_regressions(
                        cur, baseline.get(name, {}), name
                    )
            except Exception as exc:  # noqa: BLE001 — one row per failure
                row[f"{sf_name}_error"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"  {sf_name} {name}: {row.get(sf_name, 'ERR')}", flush=True)

    for name, row in results.items():
        if "sf0.1" in row and "sf1" in row and row["sf0.1"] > 0:
            row["exponent"] = round(
                math.log10(max(row["sf1"], 1e-3) / row["sf0.1"]), 3
            )

    stores = {}
    for sf_name, sf_dir, n in (
        ("sf0.1", sf01_dir, 5000),
        ("sf1", sf1_dir, 50000),
    ):
        stores[sf_name] = _store_updates(spark, sf_dir, n)
        print(f"  stores {sf_name}: {stores[sf_name]}", flush=True)
    store_exp = {
        k: round(
            math.log10(max(stores["sf1"][k], 1e-3) / stores["sf0.1"][k]), 3
        )
        for k in stores["sf0.1"]
        if stores["sf0.1"].get(k, 0) > 0 and k in stores["sf1"]
    }

    out = {
        "scale_ratio": 10,
        "calib_mc_sec": calib_mc,
        "queries": results,
        "store_updates": {**stores, "exponents": store_exp},
    }
    with open(os.path.join(REPO, "SOAK_r10.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print("wrote SOAK_r10.json")
    spark.stop()


if __name__ == "__main__":
    main()
