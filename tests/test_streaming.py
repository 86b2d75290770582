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


# ---------------------------------------------------------------------------
# event-time streaming: watermarked windows + stateful sessionization
# ---------------------------------------------------------------------------

from visual_asset_management_system_spark.streaming.windows import (  # noqa: E402
    read_events_stream,
    run_stream_to_parquet,
    sessionize_stateful,
    windowed_event_counts,
)


def _write_events(path: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"ev_{len(os.listdir(path))}.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, uid, etype, value, ts):
    return {
        "event_id": eid,
        "user_id": uid,
        "event_type": etype,
        "value": value,
        "ts": ts,
    }


def test_windowed_counts_emit_on_watermark_and_drop_late(spark, tmp_path):
    src = str(tmp_path / "events")
    sink = str(tmp_path / "winsink")
    ckpt = str(tmp_path / "winckpt")

    # batch 1: two events in the 10:00 window; max ts 11:40 → watermark
    # after this batch = 11:10, which passes 10:00-11:00's end
    _write_events(
        src,
        [
            _ev(1, 1, "click", 1.0, "2024-01-01T10:05:00Z"),
            _ev(2, 1, "click", 2.0, "2024-01-01T10:20:00Z"),
            _ev(3, 1, "click", 4.0, "2024-01-01T11:40:00Z"),
        ],
    )
    q = run_stream_to_parquet(
        windowed_event_counts(read_events_stream(spark, src)), sink, ckpt
    )
    q.awaitTermination(120)
    rows = {
        (r["window_start"].isoformat(), r["n_events"], r["sum_value"])
        for r in spark.read.parquet(sink).collect()
    }
    assert rows == {("2024-01-01T10:00:00", 2, 3.0)}

    # batch 2: a LATE event for the already-closed 10:00 window (behind
    # the 11:10 watermark → dropped) plus a 12:50 event that closes the
    # 11:00 window (watermark moves to 12:20)
    _write_events(
        src,
        [
            _ev(4, 1, "click", 99.0, "2024-01-01T10:30:00Z"),
            _ev(5, 1, "click", 8.0, "2024-01-01T12:50:00Z"),
        ],
    )
    q2 = run_stream_to_parquet(
        windowed_event_counts(read_events_stream(spark, src)), sink, ckpt
    )
    q2.awaitTermination(120)
    rows = {
        (r["window_start"].isoformat(), r["n_events"], r["sum_value"])
        for r in spark.read.parquet(sink).collect()
    }
    # late event 4 is absent; 11:00 window has only event 3
    assert rows == {
        ("2024-01-01T10:00:00", 2, 3.0),
        ("2024-01-01T11:00:00", 1, 4.0),
    }


def test_stateful_sessionize_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "sess_events")
    sink = str(tmp_path / "sesssink")
    ckpt = str(tmp_path / "sessckpt")

    # batch 1: one tight burst (a single open session) → nothing emitted
    _write_events(
        src,
        [
            _ev(1, 7, "click", 1.0, "2024-01-01T10:00:00Z"),
            _ev(2, 7, "click", 2.0, "2024-01-01T10:10:00Z"),
        ],
    )
    q = run_stream_to_parquet(
        sessionize_stateful(read_events_stream(spark, src)), sink, ckpt
    )
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 0

    # batch 2: an event >30 min later closes the pending session
    _write_events(src, [_ev(3, 7, "click", 4.0, "2024-01-01T11:30:00Z")])
    q2 = run_stream_to_parquet(
        sessionize_stateful(read_events_stream(spark, src)), sink, ckpt
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 7 and r["n_events"] == 2 and r["sum_value"] == 3.0
    assert r["session_start"].isoformat() == "2024-01-01T10:00:00"
    assert r["session_end"].isoformat() == "2024-01-01T10:10:00"
