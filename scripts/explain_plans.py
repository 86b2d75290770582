#!/usr/bin/env python
"""Plan-quality inspector: prints formatted physical plans for the
headline queries and greps for the scale-critical properties —
PushedFilters reaching the parquet scan, broadcast joins on small dims,
whole-stage codegen coverage, absence of cartesian products.

Usage: python scripts/explain_plans.py [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visual_asset_management_system_spark.queries import QUERIES  # noqa: E402
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

DEFAULT = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q_vams_simple_search",
    "q_vams_facets",
    "q_vams_file_metadata_query",
    "q_vams_one_hop_enriched",
    "q_vams_typed_validation",
    "q_workflow_auto_trigger",
    "q_knn_cosine",
    "q_lsh_ann",
    "q_ngram_jaccard_topk",
    "q_vams_bm25_search",
    "q_vams_search_explain",
    "q_vams_tags_listing",
    "q_vams_authz_table",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        df.collect()  # materialize so AQE settles on the final plan
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # codegen spans only show in simple mode (the `*(n)` prefixes),
        # and only on the AQE *final* plan (hence the collect above)
        buf2 = io.StringIO()
        with redirect_stdout(buf2):
            df.explain()
        simple = buf2.getvalue().split("== Initial Plan ==")[0]
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        print(plan)
        checks = {
            "pushed_filters": "PushedFilters: [" in plan
            and not all(
                seg.strip().startswith("[]")
                for seg in plan.split("PushedFilters:")[1:]
            ),
            "broadcast_join": "BroadcastHashJoin" in plan
            or "BroadcastNestedLoopJoin" in plan,
            "wholestage_codegen": "*(" in simple,
            "no_cartesian": "CartesianProduct" not in plan,
            # non-empty PartitionFilters (the materialized-layout probes:
            # q_lsh_ann's bucket IN-list must prune, not scan)
            "partition_pruned": any(
                seg.split("]", 1)[0].strip() != ""
                for seg in plan.split("PartitionFilters: [")[1:]
            ),
        }
        print("CHECKS:", checks)
    spark.stop()


if __name__ == "__main__":
    main()
