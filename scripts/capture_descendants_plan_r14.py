#!/usr/bin/env python
"""Capture the FULL (checkpoint-disabled) q_vams_descendants plan — the
loop-body structural artifact for the r14 per-level-dedup removal.
Usage: python scripts/capture_descendants_plan_r14.py <out_file>
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visual_asset_management_system_spark import queries as Q  # noqa: E402
from visual_asset_management_system_spark.operators import checkpointing  # noqa: E402
from visual_asset_management_system_spark.operators.graph import descendants  # noqa: E402
from visual_asset_management_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(out: str) -> None:
    spark = get_spark(app_name="capture-descendants-plan-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = Q.tables(spark, SF_DIR)
    import io
    from contextlib import redirect_stdout

    with checkpointing.disabled():
        df = descendants(t["asset_links"], "db_8", "asset_48")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    with open(out, "w") as fh:
        fh.write(plan)
    n_exch = plan.count("Exchange")
    n_bhj = plan.count("BroadcastHashJoin")
    n_agg = plan.count("HashAggregate")
    print(f"{out}: Exchange={n_exch} BroadcastHashJoin={n_bhj} HashAggregate={n_agg}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
