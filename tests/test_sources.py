"""Loader schema-conform tests: fixture dtypes drift between rounds
(events.ts has shipped as INT64 nanos and as timestamp[us]); load_tables
must normalize every physical encoding to the declared contract."""

from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from visual_asset_management_system_spark.sources.tpch import (
    TPCH_TABLES,
    load_tables,
)

SF_DIR = "/root/testdata/sf0.001"

TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 1, 12, 30, 0, 123456),
    datetime.datetime(2024, 6, 15, 23, 59, 59, 999999),
]
EXPECTED_NS = [
    int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) * 1000
    for t in TS
]


def _write_fixture_dir(tmp_path, ts_array):
    """A minimal sf dir: real parquet for every table, synthetic events."""
    d = tmp_path / "sf_drift"
    d.mkdir()
    for name in TPCH_TABLES:
        if name == "events":
            continue
        os.symlink(
            os.path.join(SF_DIR, f"{name}.parquet"), d / f"{name}.parquet"
        )
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
        }
    )
    pq.write_table(table, d / "events.parquet")
    return str(d)


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("us"), pa.timestamp("ms"), pa.timestamp("us", tz="UTC")],
    ids=["us_ntz", "ms_ntz", "us_utc"],
)
def test_events_ts_timestamp_encodings_normalize_to_ns(
    spark, tmp_path, ts_type
):
    d = _write_fixture_dir(tmp_path, pa.array(TS, ts_type))
    events = load_tables(spark, d)["events"]
    assert dict(events.dtypes)["ts"] == "bigint"
    got = {r.event_id: r.ts for r in events.collect()}
    want = dict(zip([1, 2, 3], EXPECTED_NS))
    if ts_type == pa.timestamp("ms"):  # ms encoding truncates sub-ms
        want = {k: (v // 1_000_000) * 1_000_000 for k, v in want.items()}
    assert got == want


def test_events_ts_bigint_passthrough(spark, tmp_path):
    d = _write_fixture_dir(tmp_path, pa.array(EXPECTED_NS, pa.int64()))
    events = load_tables(spark, d)["events"]
    assert dict(events.dtypes)["ts"] == "bigint"
    got = sorted(r.ts for r in events.collect())
    assert got == sorted(EXPECTED_NS)


def test_events_ts_incompatible_dtype_fails_loud(spark, tmp_path):
    d = _write_fixture_dir(tmp_path, pa.array(["x", "y", "z"]))
    with pytest.raises(TypeError, match="epoch_ns"):
        load_tables(spark, d)["events"]


def test_real_fixture_contract(spark):
    """Whatever encoding the driver shipped this round, the contract holds."""
    events = load_tables(spark, SF_DIR)["events"]
    assert dict(events.dtypes)["ts"] == "bigint"
    row = events.selectExpr(
        "min(ts) AS lo", "max(ts) AS hi", "count(*) AS n"
    ).collect()[0]
    assert row.n > 0
    # plausibly nanoseconds: 2001..2286 in ns-since-epoch
    assert 1_000_000_000_000_000_000 < row.lo < 10_000_000_000_000_000_000
    assert row.hi >= row.lo


def test_embeddings_element_type_conforms_to_float(spark, tmp_path):
    """A double-encoded embedding fixture is cast to array<float> on
    read, keeping every similarity/quantization hash stable."""
    d = tmp_path / "sf_emb_drift"
    d.mkdir()
    for name in TPCH_TABLES:
        if name == "embeddings":
            continue
        os.symlink(
            os.path.join(SF_DIR, f"{name}.parquet"), d / f"{name}.parquet"
        )
    table = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(
                [[0.25, 0.5], [0.125, 1.0]], pa.list_(pa.float64())
            ),
            "label": pa.array([0, 1], pa.int32()),
        }
    )
    pq.write_table(table, d / "embeddings.parquet")
    emb = load_tables(spark, str(d))["embeddings"]
    assert dict(emb.dtypes)["embedding"] == "array<float>"
    got = {r.vec_id: list(r.embedding) for r in emb.collect()}
    assert got == {0: [0.25, 0.5], 1: [0.125, 1.0]}
