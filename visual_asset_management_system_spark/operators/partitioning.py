"""Parallelism guard for CPU-heavy projection stages.

Spark parallelizes a projection only as far as its input partitioning,
and a parquet scan cannot split below the row-group: a dataset written
as one big row group per file caps every downstream map stage at one
task per file no matter how many cores exist (the fixture tables here
are exactly that shape — single row group — so shingling/hashing/regex
stages were observed running 1-2 tasks on a 32-core host).

``ensure_min_parallelism`` repartitions ONLY when the input has fewer
partitions than the cluster's default parallelism — one cheap shuffle
of the raw rows in exchange for full-width CPU. At 100 TB a real scan
has thousands of splits, the check fails, and this is a zero-cost
no-op; it never DOWN-partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to ``sparkContext.defaultParallelism`` iff
    it currently has fewer partitions; otherwise return it unchanged.
    Inspecting the partition count plans the frame but runs no job."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
