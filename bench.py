#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE COMPACT JSON line (≤ ~1.5 KB — the driver's artifact keeps
only the last 2000 chars of stdout, and round 9's full per-query line
outgrew that and recorded ``"parsed": null``):
    {"metric": "...", "value": N, "unit": "sec", "queries": {top-5
     slowest}, "sf": ..., "n_queries": N, "value_normalized": N,
     "detail_file": "BENCH_DETAIL.json"}

The FULL per-query raw + normalized dicts are written to
``BENCH_DETAIL.json`` next to this script (committed per round); the
compact line's ``value``/``value_normalized`` totals round-trip
against it.

``value`` is the total wall-clock seconds across the headline queries
(excluding Spark session startup and the warm-up run). Each query is
fully materialized via collect() — results are small (aggregates /
top-k), so collect measures compute, not driver transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from visual_asset_management_system_spark.queries import QUERIES, tables  # noqa: E402
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: the headline set: relational core, search surface, scale extensions
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "q21_waiting_supplier",
    "q_window_running_total",
    "q_events_sessionize",
    "q_events_interval_join",
    "q_events_funnel",
    "q_doc_phrase_search",
    "q_vams_simple_search",
    "q_vams_text_search",
    "q_vams_bm25_search",
    "q_vams_file_metadata_query",
    "q_vams_facets",
    "q_vams_metadata_pivot",
    "q_doc_stats",
    "q_pipeline_preprocess",
    "q_dedup_exact",
    "q_knn_cosine",
    "q_lsh_ann",
    "q_embedding_near_dup",
    "q_ngram_jaccard_topk",
    "q_minhash_pairs",
    "q_doc_pii",
    "q_doc_decontaminate",
    "q_doc_pack",
    "q_corpus_build",
    # round-6 tiers: partsupp TPC-H, corpus line dedup, CCNet bucketed
    # sampling, timeseries interpolation
    "q02_min_cost_supplier",
    "q_corpus_build_v2",
    "q_doc_line_dedup",
    "q_doc_ccnet_buckets",
    "q_events_interpolate",
    # round-6 continuation: reverse search, MLT, link prediction, exact
    # correlation sufficient statistics
    "q_vams_percolate",
    "q_doc_more_like_this",
    "q_vams_link_jaccard",
    "q_numeric_corr",
    "q_embedding_semdedup",
    # round-7: public perf records for the graph tier (degree-oriented
    # triangle counting) and the suggest/autocomplete tier
    "q_vams_triangles",
    "q_vams_suggest",
    # round-7: exact substring dedup (Lee et al. 2022 rewrite form)
    "q_doc_substring_dedup",
    # round-8: public perf records for the ITERATIVE graph tier —
    # pointer-jumping components, BFS descendants, pagerank (the one
    # family absent from BENCH_r1-r7)
    "q_vams_related_components",
    "q_vams_descendants",
    "q_vams_pagerank",
    # round-8: DSIR data selection
    "q_doc_dsir",
    # round-9: DSIR Gumbel resample + the skew-guarded link prediction
    "q_doc_dsir_sample",
    "q_vams_link_jaccard_guarded",
    # round-9: deterministic mergeable sketches (KMV set ops, count-min)
    "q_kmv_set_ops",
    "q_cms_heavy_hitters",
    # round-9: exact prefix-filtered set-similarity join
    "q_doc_setsim_join",
    # round-10: merge-only sketch rollup (deployment shape)
    "q_kmv_rollup_merged",
    # round-11: maintained bottom-k sample store, merge-only read
    "q_bottomk_merged",
    # round-11: maintained IVF index, partition-pruned probe
    "q_ann_store_topk",
    # round-12: batched query-table probes over the maintained index
    "q_ann_store_knn_join",
    # round-13: SQ8 int8 first pass + exact re-rank — tracked so the
    # tier's two-job latency floor is visible round-over-round
    "q_knn_sq8_rerank",
]


def normalized(timings: dict[str, float], calib_mc: float) -> dict[str, float]:
    """Per-query seconds divided by the parallel-throughput calibration
    (calib_mc_sec) — the number to compare ROUND-OVER-ROUND: raw
    wall-clock on these shared-CPU hosts swings 1.5-3x with zero code
    change, while sec/calib_mc is stable to first order because the
    heavy queries' parallel stages degrade with the same neighbor
    pressure the calibration loop measures. Empty when calibration
    itself failed (never fabricate a normal)."""
    if calib_mc <= 0:
        return {}
    return {name: round(sec / calib_mc, 3) for name, sec in timings.items()}


def compact_line(detail: dict, errors: dict[str, str]) -> dict:
    """The driver-facing stdout record: totals + the 5 slowest queries.
    Bounded by construction (5 query entries + scalar fields + ≤10
    error NAMES) so it always fits the driver's 2000-char stdout tail —
    the full per-query dicts live in BENCH_DETAIL.json."""
    timings: dict[str, float] = detail["queries"]
    out = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": "sec",
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5]),
        "sf": detail["sf"],
        "n_queries": len(timings),
        "calib_sec": detail["calib_sec"],
        "calib_mc_sec": detail["calib_mc_sec"],
        "calib_spark_sec": detail.get("calib_spark_sec"),
        # probe spread across the run's segments — the contention
        # tell: >15% means the host moved under the run and raw wall
        # totals are not comparable round-over-round
        "calib_spark_spread_pct": detail.get("calib_spark_spread_pct"),
        # spark-normalized FIRST: the engine-shaped calibration is the
        # round-over-round authority since r12 (r11 established its
        # baseline: calib_spark_sec 0.789, value_normalized_spark 80.6);
        # mc-normalized stays as the secondary, host-shaped check
        "value_normalized_spark": detail.get("value_normalized_spark"),
        "value_normalized": detail["value_normalized"],
        "detail_file": "BENCH_DETAIL.json",
    }
    if errors:
        # names only — full messages are in the detail file
        out["errors"] = sorted(errors)[:10]
    return out


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    mid = n // 2
    return round(s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0, 3)


def _calibrate() -> float:
    """Fixed single-thread CPU reference (seconds for a deterministic
    element-wise numpy loop — deliberately NO matmul, which would
    dispatch to multi-threaded BLAS and scale with core count instead
    of single-core speed). Reported so cross-round comparisons can
    normalize for host speed: bench runs land on shared-CPU VMs whose
    throughput has been observed varying >2x between rounds — divide
    query seconds by (calib_sec / historical calib) before calling
    something a regression."""
    import numpy as np

    a = np.arange(1_000_000, dtype=np.float64) / 1e6
    t0 = time.time()
    for _ in range(120):
        a = np.tanh(a * 1.0000001 + 0.1) % 0.7
    return round(time.time() - t0, 3)


def _calibrate_mc(n_threads: int = 8) -> float:
    """Parallel-throughput reference: the same element-wise loop run
    concurrently on ``n_threads`` (numpy releases the GIL, so Python
    threads genuinely occupy cores). Round 7 observed UNTOUCHED heavy
    queries re-timing 25-45% slower at an EQUAL single-core calib —
    shared-CPU neighbors can halve many-core throughput while leaving
    one core's speed intact, and the parallel stages of the heavy
    queries are exactly what that hits. Normalize multi-core-bound
    numbers by this, single-stage numbers by calib_sec."""
    import threading

    import numpy as np

    def work():
        a = np.arange(500_000, dtype=np.float64) / 1e6
        for _ in range(60):
            a = np.tanh(a * 1.0000001 + 0.1) % 0.7

    threads = [threading.Thread(target=work) for _ in range(n_threads)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return round(time.time() - t0, 3)


def _calibrate_spark(spark, runs: int = 2) -> float:
    """Engine-shaped calibration: one FIXED synthetic shuffle+agg+join
    micro-query (no fixture input, size independent of SF_DIR), best
    of ``runs`` warm runs. The numpy loops calibrate the HOST
    (single-core / parallel arithmetic throughput) but round 10 showed
    they track Spark workloads imperfectly: calib_mc_sec moved
    0.399 -> 0.373 while every plan-identical query drifted +11%
    normalized — JVM scheduler latency, shuffle I/O, and codegen
    pressure are not numpy arithmetic (VERDICT r10 watch item #3).
    This pins a reference that exercises exactly those paths: a
    4M-row range -> hash-shuffle groupBy (64k keys) -> top-k sort ->
    broadcast-sized join back -> final agg. Deterministic by
    construction (range + modulo, no randomness, no data files).

    Round 12 proved ONE sample at startup is blind to contention that
    develops over the run (calib_mc doubled, every plan-identical
    query drifted +20-300%, calib_spark moved +3%): the probe is now
    ALSO re-run between query segments — see ``_SEGMENT_LEN`` — and
    normalization is per-segment."""
    from pyspark.sql import functions as F

    def run() -> None:
        base = spark.range(0, 4_000_000, 1, 32).select(
            (F.col("id") % 65536).alias("k"),
            (F.col("id") % 977).alias("v"),
        )
        agg = base.groupBy("k").agg(F.sum("v").alias("s"))
        top = agg.orderBy(F.desc("s"), "k").limit(1000)
        base.join(top.select("k"), "k").groupBy().agg(
            F.sum("v").alias("t")
        ).collect()

    ts = []
    for _ in range(max(1, runs)):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    return round(min(ts), 3)


#: queries per calibration segment: a probe runs before the first
#: segment and after EVERY segment (best-of-2 each, matching the
#: query methodology — published query numbers are min-of-samples, so
#: the divisor must shed single-sample stalls the same way), and each
#: query is normalized by the mean of the two probes bracketing its
#: segment. ~6 extra probes on the 57-query headline run (~10s of a
#: 60-90s run) buys a normalization that tracks contention developing
#: mid-run — the exact blind spot that poisoned BENCH_r12.
_SEGMENT_LEN = 10


def spark_normalized_per_segment(
    timings: dict[str, float],
    segment_of: dict[str, int],
    probes: list[float],
) -> dict[str, float]:
    """Per-query seconds divided by the calibration of the SEGMENT the
    query ran in (mean of the probes bracketing it). Empty when
    calibration failed — never fabricate a normal."""
    if len(probes) < 2 or any(p <= 0 for p in probes):
        return {}
    out: dict[str, float] = {}
    for name, sec in timings.items():
        seg = segment_of.get(name)
        if seg is None or seg + 1 >= len(probes):
            return {}
        calib = (probes[seg] + probes[seg + 1]) / 2.0
        out[name] = round(sec / calib, 3)
    return out


def main() -> None:
    # Every step is fenced: one red query must cost one row of the
    # artifact, never the whole round's performance signal — and a
    # setup/loader failure must still emit the JSON line (with a
    # _fatal error entry), not kill the artifact.
    errors: dict[str, str] = {}

    def _safe(name: str, fn) -> bool:
        try:
            fn()
            return True
        except Exception as exc:  # noqa: BLE001 — report, don't die
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            return False

    try:
        calib = _calibrate()
    except Exception as exc:  # noqa: BLE001
        errors["_calibrate"] = f"{type(exc).__name__}: {exc}"[:500]
        calib = 0.0
    try:
        calib_mc = _calibrate_mc()
    except Exception as exc:  # noqa: BLE001
        errors["_calibrate_mc"] = f"{type(exc).__name__}: {exc}"[:500]
        calib_mc = 0.0
    try:
        spark = get_spark(app_name="spark-vams-bench")
        spark.sparkContext.setLogLevel("ERROR")
    except Exception as exc:  # noqa: BLE001 — emit the artifact anyway
        errors["_fatal_session"] = f"{type(exc).__name__}: {exc}"[:500]
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_wall",
                    "value": 0.0,
                    "unit": "sec",
                    "queries": {},
                    "sf": None,
                    "calib_sec": calib,
                    "errors": errors,
                }
            )
        )
        return

    # warm-up: JVM/codegen/file-listing costs paid once, not billed to q1
    _safe("_warmup", lambda: QUERIES["q01_pricing_summary"](spark, SF_DIR).collect())
    # engine-shaped calibration AFTER warm-up (JVM hot, like the
    # queries it normalizes) — fenced like everything else. The probe
    # shape is JIT-warmed with THREE unmeasured runs first: repeated
    # probes otherwise keep speeding up through the run (r13 observed
    # a monotonic 0.70 -> 0.49 decline over 7 probes on a quiet host)
    # and that drift would masquerade as contention in the spread and
    # bias the median low vs the r11 single-shot baseline.
    spark_probes: list[float] = []

    def _spark_probe(runs: int) -> None:
        spark_probes.append(_calibrate_spark(spark, runs=runs))

    _safe("_warm_calibrate_spark", lambda: _calibrate_spark(spark, runs=3))
    _safe("_calibrate_spark", lambda: _spark_probe(2))
    # materialize the persisted search tables up front: they are
    # MAINTAINED state in the architecture (CDC keeps them current —
    # streaming/cdc.py), so search queries bench against the index the
    # way the reference's searches hit a pre-built OpenSearch index —
    # not against each query rebuilding its own index. tables() itself
    # is fenced: the schema-conform loader raises on unknown fixture
    # encodings, and that failure class must cost warm-up rows, not
    # the artifact.
    t: dict = {}

    def _load_tables():
        t.update(tables(spark, SF_DIR))

    _safe("_load_tables", _load_tables)
    _safe("_warm_search_assets", lambda: t["search_assets"].count())
    _safe("_warm_search_files", lambda: t["search_files"].count())
    # the BM25 inverted index is maintained state too (same CDC story)
    from visual_asset_management_system_spark.queries import (  # noqa: E402
        asset_inverted_index,
    )

    def _warm_bm25():
        postings, stats = asset_inverted_index(t, SF_DIR)
        postings.count()
        stats.count()

    _safe("_warm_bm25", _warm_bm25)
    # likewise the ANN bucket layout: a write-path artifact (partition-
    # pruned probes read it), not per-query work
    from visual_asset_management_system_spark.queries import (  # noqa: E402
        _bucketed_embeddings,
    )

    _safe("_warm_ann_buckets", lambda: _bucketed_embeddings(spark, SF_DIR).count())

    # Adaptive best-of-N per query: the first pass pays one-time codegen
    # compile and absorbs transient host stalls (shared-CPU VM neighbors
    # have been measured freezing single queries 10-20x); the min is the
    # steady-state number the engine actually delivers. Round 5's
    # artifact published a 37s q_minhash_pairs that re-timed at 4-8s —
    # BOTH of its best-of-2 samples caught host stalls. Now: when the
    # two warm samples disagree by >25% the run is stall-suspect and up
    # to two more samples are taken, so a published number is always
    # backed by two mutually-consistent warm measurements (or the best
    # of four, if the host never settles).
    timings: dict[str, float] = {}
    segment_of: dict[str, int] = {}
    for idx, name in enumerate(BENCH_QUERIES):
        samples: list[float] = []

        def _one_run() -> bool:
            t0 = time.time()
            if _safe(name, lambda: QUERIES[name](spark, SF_DIR).collect()):
                samples.append(time.time() - t0)
                return True
            return False

        def _confirmed() -> bool:
            # the min is publishable once a SECOND sample lands within
            # 25% of it (cold-start codegen inflates sample 0 without
            # forcing an extra run when sample 1 merely confirms it)
            lo = min(samples)
            return sum(1 for s in samples if s <= lo * 1.25) >= 2

        ok = _one_run() and _one_run()
        while ok and len(samples) < 4 and not _confirmed():
            ok = _one_run()
        if ok and samples:
            timings[name] = round(min(samples), 3)
        segment_of[name] = idx // _SEGMENT_LEN
        # close the segment with a fresh probe: queries in it are
        # normalized by the mean of the probes bracketing them, so
        # contention that develops mid-run moves the divisor with the
        # numerator instead of poisoning the round-over-round figure
        # (BENCH_r12's failure mode). Best-of-2, matching the query
        # methodology (published numbers are min-of-samples): a
        # single-sample divisor would carry stall noise the query
        # numbers deliberately shed, biasing normalized values low.
        # segment index in the error key: any one failed probe voids
        # all spark-normalized figures, so the artifact must show WHICH
        # probe failed rather than last-failure-wins under one key
        if (idx + 1) % _SEGMENT_LEN == 0 or idx + 1 == len(BENCH_QUERIES):
            _safe(
                f"_calibrate_spark_seg{idx // _SEGMENT_LEN}",
                lambda: _spark_probe(2),
            )

    sf = None
    tail = os.path.basename(SF_DIR.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            pass

    norm = normalized(timings, calib_mc)
    # probe alignment guard: exactly one pre-run probe plus one per
    # closed segment — a failed probe anywhere would shift every later
    # segment onto the wrong divisor, so misalignment voids the
    # spark-normalized figures rather than silently skewing them
    n_segments = (len(BENCH_QUERIES) + _SEGMENT_LEN - 1) // _SEGMENT_LEN
    if len(spark_probes) != n_segments + 1:
        spark_probes = []
    norm_spark = spark_normalized_per_segment(
        timings, segment_of, spark_probes
    )
    calib_spark = _median(spark_probes) if spark_probes else 0.0
    spread_pct = (
        round(100.0 * (max(spark_probes) - min(spark_probes)) / calib_spark, 1)
        if calib_spark > 0
        else None
    )
    detail = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calib_sec": calib,
        "calib_mc_sec": calib_mc,
        # the headline scalar is the MEDIAN of the interleaved probes
        # (comparable to the pre-r13 once-at-startup figure on a quiet
        # host); the full probe series + spread are published so a
        # contended run is visible as data, not divined from drift
        "calib_spark_sec": calib_spark,
        "calib_spark_probes": spark_probes,
        "calib_spark_spread_pct": spread_pct,
        # round-over-round comparable (sec / calib_mc_sec); raw seconds
        # above remain the ground truth for the ≤29s baseline envelope
        "queries_normalized": norm,
        "value_normalized": round(sum(norm.values()), 3),
        # engine-shaped normalization, PER-SEGMENT since r13: each
        # query's divisor is the mean of the probes bracketing its
        # segment, so contention that develops over the run moves the
        # divisor with it (BENCH_r12's once-at-startup calibration
        # provably missed a 2x mid-run slowdown)
        "queries_normalized_spark": norm_spark,
        "value_normalized_spark": (
            round(sum(norm_spark.values()), 3) if norm_spark else None
        ),
        # which normalization is the round-over-round AUTHORITY (r11
        # verdict task 7): the Spark-shaped one, now that r11 minted
        # its baseline (calib_spark_sec 0.789 / value_normalized_spark
        # 80.6); mc-normalized is the secondary host-shaped check and
        # plan structure (PLAN_STATS diffs) stays the primary
        # regression evidence over any single wall-clock figure
        "normalization_authority": "value_normalized_spark",
    }
    if errors:
        detail["errors"] = errors
    detail_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_file, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as exc:
        errors["_detail_write"] = f"{type(exc).__name__}: {exc}"[:200]
    # the stdout line must survive the driver's 2000-char tail capture:
    # full per-query dicts live in BENCH_DETAIL.json, the line carries
    # the totals plus the 5 slowest queries (the triage signal)
    print(json.dumps(compact_line(detail, errors)))
    try:
        spark.stop()
    except Exception:  # noqa: BLE001 — the JSON line is already out
        pass


if __name__ == "__main__":
    main()
