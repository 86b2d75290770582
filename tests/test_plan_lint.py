"""Plan lint: structural rules every registered query's physical plan
must satisfy. Planning only — no query is executed, so the whole
registry is checked in one session.

Rules:
- NO CartesianProduct anywhere. The engine's two intentional cross
  joins (BM25 stats, bulk-tally denominators) broadcast a 1-row frame
  and therefore plan as BroadcastNestedLoopJoin, which is allowed; an
  un-broadcast cartesian is always a bug at scale.
- No row-at-a-time Python UDF (BatchEvalPython) — Python is allowed
  only as Arrow-batched stages (ArrowEvalPython / mapInPandas /
  FlatMapGroupsInPandas*).
"""

from __future__ import annotations

import pytest

from visual_asset_management_system_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_and_no_row_udf(spark, name):
    plan = (
        QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} plans a row-at-a-time UDF"
