"""Export sink: partitioned bulk extraction of catalog entities.

The reference's assetExportService.py (1,173 LoC) streams assets/files/
metadata for a database out of DynamoDB+S3 into an export package. The
Spark-native re-expression is a partitioned columnar write — one job,
every property the service hand-rolls (pagination, batching, retry)
subsumed by the writer — plus a manifest derived from the written data
(the service's export summary).

Scale shape: ``partitionBy`` keys become directory partitions, so a
downstream import prunes on them; writer parallelism is the upstream
partitioning (repartition on the export keys before writing when the
source is skewed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_entities(
    df: DataFrame,
    out_dir: str,
    partition_by: tuple[str, ...] = ("database_id",),
    fmt: str = "parquet",
) -> None:
    """Write an entity table as a partitioned export package."""
    writer = df.write.mode("overwrite").partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(out_dir)
    elif fmt == "json":
        writer.json(out_dir)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def export_manifest(
    spark: SparkSession,
    out_dir: str,
    partition_by: tuple[str, ...] = ("database_id",),
    fmt: str = "parquet",
) -> DataFrame:
    """Per-partition row counts of a written export — the export-summary
    manifest, computed FROM the written files (same ``fmt`` as the
    write) so it verifies the export rather than restating the input."""
    if fmt == "parquet":
        df = spark.read.parquet(out_dir)
    elif fmt == "json":
        df = spark.read.json(out_dir)
    else:
        raise ValueError(f"unsupported export format: {fmt}")
    return df.groupBy(*partition_by).agg(F.count(F.lit(1)).alias("n_rows"))
