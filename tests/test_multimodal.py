"""Multimodal plumbing tests: schema, mapInPandas batching, frame
explosion. Decode kernels are stubs (no codec libs in container) — the
Spark-side shapes are what's under test."""

from __future__ import annotations

from pyspark.sql import functions as F

from visual_asset_management_system_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
)


def _media_df(spark):
    rows = [
        ("img_1", "image", b"\x89PNG fake bytes 1", (640, 480, None, "png")),
        ("img_2", "image", b"\x89PNG fake bytes 22", (800, 600, None, "png")),
        ("vid_1", "video", b"\x00\x00ftyp fake", (1920, 1080, 3.5, "h264")),
        ("aud_1", "audio", None, (None, None, 12.0, "opus")),
    ]
    return spark.createDataFrame(
        [(m, t, c, meta) for m, t, c, meta in rows], MEDIA_SCHEMA
    )


def test_extract_features_deterministic(spark):
    media = _media_df(spark)
    out = extract_features(media)
    assert out.schema["features"].dataType.simpleString() == "array<float>"
    rows = {r["media_id"]: r["features"] for r in out.collect()}
    assert len(rows) == 4 and all(len(v) == 16 for v in rows.values())
    # same bytes → same features (run twice)
    rows2 = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert rows == rows2
    # null content → zero vector
    assert all(v == 0.0 for v in rows["aud_1"])


def test_resize_updates_only_images(spark):
    out = resize_images(_media_df(spark), 256, 256)
    rows = {r["media_id"]: r["meta"] for r in out.collect()}
    assert rows["img_1"]["width"] == 256 and rows["img_1"]["height"] == 256
    assert rows["vid_1"]["width"] == 1920  # untouched


def test_sample_frames_row_explosion(spark):
    out = sample_frames(_media_df(spark), every_s=1.0)
    rows = out.filter(F.col("media_id") == "vid_1").collect()
    # duration 3.5s at 1fps → frames 0,1,2,3 (sequence 0..3)
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[-1]["frame_ts_s"] == 3.0
    assert all(r["frame_content"] is None for r in rows)  # stub decode
