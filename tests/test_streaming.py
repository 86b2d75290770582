"""CDC pipeline tests: change-log stream → search-table maintenance.

Golden-file style (SURVEY §5): a change-log slice in, expected search
rows out — including REMOVE handling and incremental re-upsert.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from visual_asset_management_system_spark.streaming.cdc import (
    apply_cdc_batch,
    start_search_table_stream,
)


def _recompute_factory(spark):
    """Search-row recompute for the affected keys: uppercase-name docs —
    a stand-in for the full join pipeline (exercised in test_oracle)."""
    base = spark.createDataFrame(
        [("db_1", f"asset_{i}", f"name {i}") for i in range(20)],
        "database_id string, asset_id string, asset_name string",
    )

    def recompute(keys):
        return base.join(keys, ["database_id", "asset_id"], "left_semi").withColumn(
            "doc", F.upper("asset_name")
        )

    return recompute


def _write_changelog(path: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"batch_{len(os.listdir(path))}.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_apply_cdc_batch_upsert_and_remove(spark, tmp_path):
    sink = str(tmp_path / "search_assets")
    recompute = _recompute_factory(spark)

    batch1 = spark.createDataFrame(
        [
            (1, "INSERT", "assets", "db_1", "asset_1", None, None),
            (2, "INSERT", "assets", "db_1", "asset_2", None, None),
        ],
        "seq long, event_name string, source string, database_id string, "
        "asset_id string, new_image string, event_time timestamp",
    )
    apply_cdc_batch(batch1, recompute, sink)
    out = spark.read.parquet(sink)
    assert {r["asset_id"] for r in out.collect()} == {"asset_1", "asset_2"}

    # MODIFY asset_1 (idempotent re-upsert), REMOVE asset_2, INSERT asset_3
    batch2 = spark.createDataFrame(
        [
            (3, "MODIFY", "assets", "db_1", "asset_1", None, None),
            (4, "REMOVE", "assets", "db_1", "asset_2", None, None),
            (5, "INSERT", "assets", "db_1", "asset_3", None, None),
        ],
        batch1.schema,
    )
    apply_cdc_batch(batch2, recompute, sink)
    rows = {r["asset_id"]: r["doc"] for r in spark.read.parquet(sink).collect()}
    assert set(rows) == {"asset_1", "asset_3"}
    assert rows["asset_1"] == "NAME 1"


def test_streaming_wrapper_available_now(spark, tmp_path):
    changelog = str(tmp_path / "changelog")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    recompute = _recompute_factory(spark)

    _write_changelog(
        changelog,
        [
            {
                "seq": 1,
                "event_name": "INSERT",
                "source": "assets",
                "database_id": "db_1",
                "asset_id": "asset_5",
                "new_image": None,
                "event_time": "2024-01-01T00:00:00Z",
            }
        ],
    )
    q = start_search_table_stream(
        spark, changelog, sink, recompute, ckpt, trigger_once=True
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert [r["asset_id"] for r in out.collect()] == ["asset_5"]

    # second batch arrives; checkpoint resumes without reprocessing batch 1
    _write_changelog(
        changelog,
        [
            {
                "seq": 2,
                "event_name": "INSERT",
                "source": "assets",
                "database_id": "db_1",
                "asset_id": "asset_7",
                "new_image": None,
                "event_time": "2024-01-01T01:00:00Z",
            }
        ],
    )
    q2 = start_search_table_stream(
        spark, changelog, sink, recompute, ckpt, trigger_once=True
    )
    q2.awaitTermination(120)
    ids = {r["asset_id"] for r in spark.read.parquet(sink).collect()}
    assert ids == {"asset_5", "asset_7"}
