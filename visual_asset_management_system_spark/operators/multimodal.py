"""Multimodal (image/audio/video) column operators.

Design: media is an opaque ``binary`` column plus typed metadata struct
— the Spark-native equivalent of the reference's S3-object +
preview/thumbnail pipelines (backendPipelines/preview, conversion;
SURVEY §2.10). Ingest via ``spark.read.format("binaryFile")``; heavy
per-item compute runs as Arrow-batched ``mapInPandas`` stages so
decode parallelism == partition parallelism and bytes never hit the
driver.

The actual codecs (PIL/ffmpeg/torchvision) are NOT in this container,
so the decode kernels are STUBS: deterministic fakes clearly marked
below. The Spark-side plumbing — schemas, batch iteration, partition
sizing — is real and tested; swapping a stub for a real codec changes
only the body of the pandas function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the media-asset table (one row per media object/version)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 16


def read_binary_dir(spark, path: str, pattern: str = "*") -> DataFrame:
    """Ingest a directory of media files as (path, modificationTime,
    length, content) via the built-in binaryFile source."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )


def _fake_decode(content: bytes | None) -> list[float]:
    """STUB decode kernel — deterministic fake feature vector.

    A real implementation would decode the image/audio and run a feature
    extractor; this container has no codec libs, so we hash bytes into a
    fixed-dim vector. Deterministic: same bytes → same features.
    feature[i] = (first-8-hex-digits of md5(content ‖ ascii(i)) mod
    1000) / 1000 — chosen to be replicable in ANSI SQL (DuckDB md5) so
    the differential oracle can verify the mapInPandas plumbing
    end-to-end, not just row counts.
    """
    import hashlib

    if content is None:
        return [0.0] * _FEATURE_DIM
    return [
        (
            int(
                hashlib.md5(content + str(i).encode()).hexdigest()[:8], 16
            )
            % 1000
        )
        / 1000.0
        for i in range(_FEATURE_DIM)
    ]


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Append a ``features array<float>`` column via mapInPandas.

    Arrow-batched: each partition streams pandas batches through the
    kernel; binary payloads stay executor-side.
    """
    from .partitioning import ensure_min_parallelism

    out_schema = T.StructType(
        media.schema.fields
        + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = pdf["content"].map(_fake_decode)
            yield pdf

    # decode parallelism == partition parallelism: guard against few-
    # split inputs or one Python worker does every Arrow batch
    return ensure_min_parallelism(media).mapInPandas(kernel, out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB image resize — metadata-only (no pixel transform).

    Real codecs absent in this container (see module docstring). The
    returned plan updates the meta struct; content passes through
    unchanged so the stage is still exercisable end-to-end.
    """
    return media.withColumn(
        "meta",
        F.when(
            F.col("media_type") == "image",
            F.struct(
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col("meta.duration_s").alias("duration_s"),
                F.col("meta.codec").alias("codec"),
            ),
        ).otherwise(F.col("meta")),
    )


def sample_frames(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Frame sampling plan: one output row per sampled timestamp
    (UDTF-style row expansion via explode over a generated sequence).
    Frame *decode* is stubbed (no codecs); the row-explosion plumbing —
    the part that matters for partitioning — is real."""
    n_frames = F.greatest(
        (F.coalesce(F.col("meta.duration_s"), F.lit(0.0)) / every_s).cast("int"),
        F.lit(0),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames)))
        .withColumn("frame_ts_s", F.col("frame_idx") * every_s)
        .withColumn(
            "frame_content",
            F.lit(None).cast("binary"),  # STUB: no decoder in container
        )
    )
