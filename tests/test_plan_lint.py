"""Plan lint: structural rules every registered query's physical plan
must satisfy.

Lineage-cut checkpoints are DISABLED during the lint (operators/
checkpointing.py) so the FULL plan is inspected — with checkpoints on,
everything behind a localCheckpoint is an opaque RDD scan and the
assertions would be vacuous for exactly the iterative/multi-consumer
queries that need them most. Queries still planning-only except for
unavoidable setup scalars (e.g. pagerank's node count).

Rules:
- NO CartesianProduct anywhere. The engine's intentional cross joins
  (BM25 stats, bulk-tally denominators, kNN query sets, dangling-mass
  frames) broadcast a small frame and therefore plan as
  BroadcastNestedLoopJoin, which is allowed; an un-broadcast cartesian
  is always a bug at scale.
- No row-at-a-time Python UDF (BatchEvalPython) — Python is allowed
  only as Arrow-batched stages (ArrowEvalPython / mapInPandas /
  FlatMapGroupsInPandas*).
"""

from __future__ import annotations

import os
import re

import pytest

from visual_asset_management_system_spark.operators import checkpointing
from visual_asset_management_system_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


#: queries whose UN-truncated plan grows combinatorially with loop
#: depth (each iteration references the previous relation multiple
#: times: pagerank ranks, BFS frontier+visited, CC labels) — linted
#: with checkpoints ON here, and their loop BODY is linted at depth 1
#: in test_iterative_loop_bodies below.
_EXPONENTIAL_PLANS = {
    "q_vams_pagerank",
    "q_vams_descendants",
    "q_vams_related_components",
    # LSH candidates + exact-verify + connected components: the CC loop
    # re-references the (already multi-consumer) pair relation each
    # round — untruncated replanning is combinatorial. CC's loop body
    # is linted at depth 1 in test_iterative_loop_bodies; the pre-CC
    # pipeline is identical to q_ngram_jaccard_topk's, which is linted
    # untruncated.
    "q_dedup_representatives",
}


def _lint(plan: str, name: str) -> None:
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} plans a row-at-a-time UDF"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_and_no_row_udf(spark, name):
    # pass 1: checkpoints on (fast — truncated plans). If construction
    # never hit a checkpoint, this IS the full plan; done. Otherwise
    # re-plan under disabled() so the truncated subplans are inspected
    # too (slow analysis, paid only by the ~10 checkpointing queries).
    before = checkpointing.CALLS
    df = QUERIES[name](spark, SF)
    hit_checkpoint = checkpointing.CALLS > before
    if hit_checkpoint and name not in _EXPONENTIAL_PLANS:
        with checkpointing.disabled():
            df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    _lint(plan, name)


def test_iterative_loop_bodies(spark):
    """Full-plan lint of one iteration of each checkpoint-exempted
    iterative operator — the loop body is what repeats, so depth 1
    covers the structure depth 10 would."""
    from pyspark.sql import functions as F

    from visual_asset_management_system_spark.operators.graph import (
        connected_components,
        descendants,
        pagerank,
    )
    from visual_asset_management_system_spark.queries import tables

    t = tables(spark, SF)
    edges = t["asset_links"].select(
        F.concat_ws("/", "from_database_id", "from_asset_id").alias("src"),
        F.concat_ws("/", "to_database_id", "to_asset_id").alias("dst"),
    )
    with checkpointing.disabled():
        for label, df in [
            ("pagerank[iters=1]", pagerank(edges, iters=1)),
            (
                "descendants[depth=1]",
                descendants(t["asset_links"], "db_8", "asset_48", max_depth=1),
            ),
            (
                "connected_components[rounds=1]",
                connected_components(edges, max_iter=1),
            ),
        ]:
            _lint(df._jdf.queryExecution().sparkPlan().toString(), label)


def test_funnel_and_retention_single_user_exchange(spark):
    """The behavioral-analytics queries' core claim is structural: all
    stacked windows (and the dedup/count that follows) reuse ONE
    user_id hash partitioning. Pin the exchange count so a refactor
    back to the 5-exchange cascade form fails loudly."""
    import re

    from visual_asset_management_system_spark.queries import QUERIES

    for name, max_hash_exchanges in [
        # funnel: 1 user-id exchange + the 3-row final rollup branches
        # (deduplicated by ReuseExchange at execution); retention: the
        # user-id exchange + the cohort-key aggregate exchange
        ("q_events_funnel", 3),
        ("q_events_retention", 2),
    ]:
        plan = (
            QUERIES[name](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n <= max_hash_exchanges, (
            f"{name}: {n} hash exchanges (max {max_hash_exchanges}) — "
            f"the one-user-shuffle window form regressed\n{plan[:1200]}"
        )
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, (
            f"{name} should be join-free (window form), got joins"
        )


def test_q21_two_level_aggregation_no_expand(spark):
    """r15: q21's per-order distinct counts run as a TWO-LEVEL
    aggregation over one hash(l_orderkey) exchange. Pin both halves of
    that claim: (a) Catalyst's RewriteDistinctAggregates Expand (3x
    line replication + a second line-grain shuffle) stays out of the
    plan, and (b) the two-level form agrees row-for-row, in order,
    with the distinct-aggregate form it replaced."""
    from pyspark.sql import functions as F

    from visual_asset_management_system_spark.queries import tables

    df = QUERIES["q21_waiting_supplier"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, (
        "q21 regressed to the distinct-aggregate Expand form:\n" + plan[:1200]
    )
    got = [tuple(r) for r in df.collect()]

    # the replaced distinct-aggregate form, frozen verbatim as reference
    t = tables(spark, SF)
    li = t["lineitem"]
    is_r = F.col("l_returnflag") == "R"
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(is_r, F.col("l_suppkey"))).alias("n_r_supp"),
        F.min(F.when(is_r, F.col("l_suppkey"))).alias("r_suppkey"),
        F.count(F.when(is_r, F.lit(1))).alias("n_r_lines"),
    )
    ref = (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("r_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_r_lines").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
    assert got == [tuple(r) for r in ref.collect()], (
        "two-level aggregation diverged from the distinct-aggregate form"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_canonicalizable(spark, name):
    """Driver-canonicalizer contract: the correctness gate sorts result
    frames with pandas ``sort_values``, and list/dict cells are
    unhashable there (the exact failure that turned
    q_multimodal_features / q_doc_repeated_ngrams red in round 5).
    Registered queries must therefore emit only scalar top-level
    columns — serialize arrays with concat_ws/array_to_string in the
    final projection on BOTH engines."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = QUERIES[name](spark, SF).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} emits non-scalar top-level columns {bad} — the driver "
        f"canonicalizer cannot sort these; stringify them in the final "
        f"projection (and mirror in the oracle)"
    )


#: Max times the EXECUTED plan may scan any one source table. Calibrated
#: against the round-6 fleet: the widest legitimate fan-outs (dual-index
#: union over part, semdedup's bucketed pair surface over embeddings,
#: one-hop's double-sided enrichment) execute ≤ 6 scans of a table, with
#: ReusedExchange deduplicating the rest. The round-6 verdict's
#: repeated-subtree defect (q_numeric_corr: 12 lineitem scans / 24 hash
#: aggregates / 0 ReusedExchange for a 6-row result) sat at 2× this
#: budget — the class this lint exists to catch.
_SCAN_BUDGET = 6

#: name-keyed budget overrides for queries whose legitimate branch
#: fan-out exceeds the default depending on CACHE state (suite-order
#: dependent): bm25 fans the asset search table into the postings
#: build, the stats row, the filtered-postings probe, and the score
#: join — with the maintained-state persists cold, the un-materialized
#: subtree appears in up to ~10 branches (4-5 once the caches are
#: warm). The override still fails the k(k-1)/2-scaling
#: repeated-subtree class this lint hunts (the round-6 defect executed
#: 12 identical scans for k=4; k=5 would be 20).
_SCAN_BUDGET_OVERRIDES: dict[str, int] = {}

#: Max Exchange operators in the EXECUTED plan — the shuffle sibling of
#: the scan budget: a rewrite that re-shuffles per branch (k² pair
#: surfaces, per-column unionAll aggregates) multiplies exchanges long
#: before it multiplies scans of any ONE table. Calibrated on the
#: round-8 fleet: p95 = 6, and the only legitimate outliers are the
#: iterative/multi-dictionary plans listed in the overrides. AQE can
#: swap a shuffle for a broadcast run-to-run, so the check reuses the
#: scan lint's warm retry before judging.
_EXCHANGE_BUDGET = 8
_EXCHANGE_BUDGET_OVERRIDES: dict[str, int] = {
    # unrolled iterative BPE: one dictionary-sized agg per merge step
    "q_doc_bpe_encode": 14,
    "q_doc_bpe_merges": 10,
    # DSIR oracle-parity (unhashed) mode: gram/target/raw dictionaries
    # + three single-row stat aggs; all but three are dictionary-sized
    "q_doc_dsir": 13,
    # same weight pipeline + the TakeOrderedAndProject selection
    "q_doc_dsir_sample": 13,
    # two-level sketch rollup DEMO: segment build (2) + merge (2) +
    # n_segments (1) + the exact-comparator countDistinct exhibit (2)
    # + final sort/join staging; every post-base exchange is
    # sketch-sized (≤ groups·k rows). The deployment path — merging
    # PRE-BUILT segment sketches — is 2 exchanges (see kmv_merge).
    "q_kmv_rollup": 10,
}

from visual_asset_management_system_spark.plans.audit import (  # noqa: E402
    plan_structure,
    structure_regressions,
)

#: committed executed-plan-structure baseline at the test SF
#: (regenerate on INTENTIONAL plan changes:
#:  ``python scripts/plan_stats.py --test``)
_BASELINE_PATH = os.path.join(os.path.dirname(__file__), "plan_stats_baseline.json")


def _baseline() -> dict[str, dict]:
    import json

    try:
        with open(_BASELINE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_executed_plan_scan_budget(spark, name):
    """Repeated-subtree lint + structure-regression gate. After
    execution (so ReuseExchange and lineage-cut checkpoints have done
    their work):

    1. no registered query may scan any single source table more than
       _SCAN_BUDGET times — a plan that re-runs a shared aggregate per
       output row (the q_numeric_corr round-6 defect) multiplies
       full-corpus scans at 100 TB while every structural lint above
       still passes;
    2. the structure must not GROW past the committed baseline
       (tests/plan_stats_baseline.json) — the budget catches the
       catastrophic class, the baseline catches one extra shuffle or
       duplicate scan the budget's headroom would hide. Bench
       wall-clock is host-noisy (1.5-3x swings with zero code change);
       this gate is the noise-proof regression signal. Intentional
       plan changes: regenerate with ``scripts/plan_stats.py --test``.
    """
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")

    def structure_of_run():
        df = QUERIES[name](spark, SF)
        df.collect()
        return plan_structure(df)

    budget = _SCAN_BUDGET_OVERRIDES.get(name, _SCAN_BUDGET)
    ex_budget = _EXCHANGE_BUDGET_OVERRIDES.get(name, _EXCHANGE_BUDGET)
    base = _baseline().get(name, {})

    def problems(cur):
        over = {t: n for t, n in cur["scans"].items() if n > budget}
        probs = []
        if over:
            probs.append(
                f"{name} executed plan scans {over} times (budget {budget} "
                f"per table) — a shared subtree is being re-executed; "
                f"materialize it once"
            )
        if cur["exchanges"] > ex_budget:
            probs.append(
                f"{name} executed plan holds {cur['exchanges']} Exchanges "
                f"(budget {ex_budget}) — a branch is re-shuffling"
            )
        if "scans" in base:  # names without a baseline entry gate on budget only
            probs.extend(structure_regressions(cur, base, name))
        return probs

    cur = structure_of_run()
    probs = problems(cur)
    if probs:
        # AQE can swap a shuffle for a broadcast run-to-run and the
        # first execution may build maintained state inline — re-run
        # warm before judging (steady-state contract)
        cur = structure_of_run()
        probs = problems(cur)
    assert not probs, "; ".join(probs) + (
        "\n(intentional change? regenerate the baseline: "
        "python scripts/plan_stats.py --test)"
    )


def test_structure_regression_comparator():
    """Contract of the baseline gate's comparator: growth in any
    per-table scan count or in the exchange count is a regression (the
    injected-duplicate-subtree class); shrinkage and new baseline-less
    queries are not."""
    base = {"scans": {"lineitem": 2, "part": 1}, "exchanges": 4}
    same = {"scans": {"lineitem": 2, "part": 1}, "exchanges": 4}
    assert structure_regressions(same, base, "q") == []
    # one extra scan of an already-read table = duplicate subtree
    dup = {"scans": {"lineitem": 3, "part": 1}, "exchanges": 4}
    assert any("lineitem 3x" in p for p in structure_regressions(dup, base, "q"))
    # a table the baseline never scanned
    new_tbl = {"scans": {"lineitem": 2, "orders": 1}, "exchanges": 4}
    assert any("orders 1x" in p for p in structure_regressions(new_tbl, base, "q"))
    # an extra shuffle
    reshuffle = {"scans": {"lineitem": 2}, "exchanges": 5}
    assert any("5 exchanges" in p for p in structure_regressions(reshuffle, base, "q"))
    # improvements pass silently (folded into the next regenerate)
    better = {"scans": {"lineitem": 1}, "exchanges": 3}
    assert structure_regressions(better, base, "q") == []


def test_topk_windows_get_group_limit_pushdown(spark):
    """The per-group top-k queries rely on Spark's WindowGroupLimit
    (rank-limit pushdown: each partition keeps only k rows before the
    final sort) — without it a hot group materializes its full window.
    Pin the physical pattern so a refactor that breaks pushdown
    (e.g. referencing the rank column before filtering) fails loudly."""
    for name in [
        "q_doc_tfidf_keywords",
        "q_vams_suggest",
        "q_knn_join",
        "q_events_trending",
        # the KMV sketch build's rank-k filter (operators/sketches.py
        # _topk_hashes) — without pushdown a hot group sorts ALL its
        # distinct hashes instead of keeping k per partition
        "q_kmv_distinct",
        "q_kmv_rollup",
        "q_doc_source_cap",
        # bottom-k quantile synopsis: the sample's rank-k filter
        "q_bottomk_quantiles",
        # its deployment shape: the store merge's re-take-k filter
        "q_bottomk_merged",
    ]:
        plan = (
            QUERIES[name](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan, (
            f"{name}: rank-limit pushdown (WindowGroupLimit) missing — "
            f"the top-k window materializes whole groups"
        )
