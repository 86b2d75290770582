"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
BASELINE.json scale extensions, as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents (same column
names/aliases; VAMS derived views inlined as CTEs). Entries without an
oracle are non-SQL-expressible (LSH candidate generation internals) and
get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from visual_asset_management_system_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's oracle gate checks the FIRST 50 entries of queries().
# Registration order alone let round 2's new queries push the entire
# LLM-pipeline/workflow block (registration idx 50-74) past the window,
# so those 25 shipped with no driver-confirmed correctness row
# (VERDICT.md r2, finding #2). queries() therefore emits a deliberate
# priority order instead of raw registration order:
#   1. entries with no driver-green row yet (never inside the window),
#      in registration order — new queries added this round land here
#      automatically;
#   2. entries whose engine code or oracle changed this round and need a
#      re-check (the r2 red row q_vams_link_auth_counts after its
#      BIGINT-cast oracle fix; the one-hop family after the broadcast
#      rework in operators/graph.py);
#   3. the remaining twice-driver-green entries, registration order.
_DRIVER_GREEN = {
    # green in CORRECTNESS_r01 and/or r02 (driver-confirmed at least once)
    "q01_pricing_summary", "q03_shipping_priority",
    "q05_local_supplier_volume", "q_top_parts_revenue", "q_window_rank",
    "q_window_running_total", "q_cube_returns", "q_rollup_orders",
    "q_distinct_counts", "q_percentiles", "q_set_except",
    "q_set_intersect", "q_theta_join", "q_range_band_join",
    "q_offset_pagination", "q_events_tumbling", "q_events_hopping",
    "q_events_sessionize", "q_events_asof", "q_vams_simple_search",
    "q_vams_text_search", "q_vams_facets", "q_vams_search_totals",
    "q_vams_metadata_facets", "q_vams_metadata_pivot",
    "q_vams_metadata_query", "q_vams_metadata_exists",
    "q_vams_file_metadata_query", "q_vams_file_attr_value_search",
    "q_vams_descendants", "q_vams_latest_versions", "q_vams_version_asof",
    "q_vams_file_asset_join", "q_vams_orphans", "q_vams_graph_export",
    "q_vams_keyset_page", "q_vams_auto_register", "q_vams_authz",
    "q_vams_point_lookup", "q_vams_keyed_listing", "q_vams_dual_search",
    "q_vams_highlight", "q_vams_relationship_flags",
    "q_vams_schema_validation", "q_vams_typed_validation",
    "q_vams_version_file_counts", "q_vams_scalar_funcs",
}
_RECHECK = [
    "q_vams_link_auth_counts",   # r2 red row; oracle SUMs now CAST BIGINT
    "q_vams_one_hop",            # one-hop join strategy reworked this round
    "q_vams_one_hop_enriched",
]


def _driver_order(names: list[str]) -> list[str]:
    never = [n for n in names if n not in _DRIVER_GREEN and n not in _RECHECK]
    recheck = [n for n in _RECHECK if n in names]
    rest = [n for n in names if n in _DRIVER_GREEN and n not in recheck]
    return never + recheck + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _driver_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    order = _driver_order(list(QUERIES))
    return {n: ORACLES[n] for n in order if n in ORACLES}
