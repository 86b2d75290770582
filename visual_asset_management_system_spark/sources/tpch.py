"""Loaders for the driver-generated deterministic parquet tables.

``/root/testdata/sf{N}/`` holds one parquet per table (TESTDATA.md):
TPC-H-ish star schema + ``events`` (stream), ``documents`` (text corpus),
``embeddings`` (vector corpus).

At 100 TB these would be partitioned/bucketed Delta or Parquet datasets;
the loader keeps the interface identical (a named DataFrame per table)
so the plans don't care. Reads are plain ``spark.read.parquet`` so
Catalyst's filter pushdown / column pruning reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Load every driver table as a DataFrame keyed by name."""
    # events.ts is INT64 TIMESTAMP(NANOS) parquet, which vanilla Spark
    # rejects; read it as bigint nanos (exact integer math) regardless of
    # how the caller built the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in TPCH_TABLES
    }


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view for ``spark.sql`` plans."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
