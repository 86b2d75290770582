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

import os
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
_RECHECK = [
    # manual overrides: driver-green entries whose standing green row is
    # STALE — every name below last saw the driver in round 2 while
    # engine code they depend on changed in rounds 3-5 (VERDICT r04
    # item 8 names the first three explicitly; the rest are the
    # remainder of the r02-era rotation block, refreshed while window
    # capacity allows). r04 re-greened the previous _RECHECK list.
    "q_vams_authz",
    "q_vams_highlight",
    "q_vams_schema_validation",
    "q_vams_auto_register",
    "q_vams_dual_search",
    "q_vams_keyed_listing",
    "q_vams_keyset_page",
    "q_vams_point_lookup",
    "q_vams_relationship_flags",
    "q_vams_scalar_funcs",
    "q_vams_typed_validation",
    "q_vams_version_file_counts",
]


def _driver_green() -> set[str]:
    """Names with a fully-green row in ANY prior CORRECTNESS_r*.json.

    Self-maintaining across rounds: a red row (hash/schema/rows
    mismatch) or a never-recorded name sorts to the front of the next
    round's window automatically. A row counts green only if rows and
    schema matched and the value hash did not fail (rows-only entries
    have no hash and count on rows+schema)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    # the MOST RECENT row per name wins: a red row in r02 must not keep
    # a name re-greened in r04 pinned to the priority window forever
    latest: dict[str, tuple[int, bool]] = {}
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match") is not False
                and row.get("err") is None
            )
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, ok)
    return {n for n, (_, ok) in latest.items() if ok}


def _driver_order(names: list[str]) -> list[str]:
    checked = _driver_green()
    never = [n for n in names if n not in checked and n not in _RECHECK]
    recheck = [n for n in _RECHECK if n in names]
    rest = [n for n in names if n in checked and n not in recheck]
    return never + recheck + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _driver_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    order = _driver_order(list(QUERIES))
    return {n: ORACLES[n] for n in order if n in ORACLES}
