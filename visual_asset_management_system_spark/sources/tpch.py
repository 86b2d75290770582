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
from pyspark.sql import functions as F

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

#: Declared on-read contract per table: {column: canonical type}. The
#: fixtures are driver-generated and their physical encodings have drifted
#: between rounds (events.ts shipped as INT64 nanos, later as
#: timestamp[us]); the engine does not control them, so every load conforms
#: columns to this map instead of trusting the parquet footer. Adding a row
#: here is the whole fix for the next dtype drift.
#:
#: ``epoch_ns`` means "bigint nanoseconds since the epoch": bigint columns
#: pass through, timestamp/timestamp_ntz columns are converted exactly via
#: unix_micros (session timezone is pinned to UTC below, so the NTZ→TZ cast
#: is the identity on the stored value — matching DuckDB's epoch_us(ts)).
EXPECTED_SCHEMA: dict[str, dict[str, str]] = {
    "events": {"ts": "epoch_ns"},
    # type-sensitive numeric columns (decimal-vs-double drift would
    # silently change aggregate hashing); casts are no-ops while the
    # fixture already matches
    "lineitem": {
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
    },
    "orders": {"o_totalprice": "double"},
    "documents": {"doc_id": "bigint", "text": "string"},
    # embedding element width matters: a double-encoded fixture would
    # silently change every cosine/quantization hash; conform to float
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
}


def _conform(df: DataFrame, table: str) -> DataFrame:
    rules = EXPECTED_SCHEMA.get(table)
    if not rules:
        return df
    dtypes = dict(df.dtypes)
    for col, target in rules.items():
        if col not in dtypes:
            raise ValueError(
                f"{table}.{col} missing from fixture (have {sorted(dtypes)})"
            )
        actual = dtypes[col]
        if target == "epoch_ns":
            if actual == "bigint":  # INT64-nanos encoding (nanosAsLong)
                continue
            if actual in ("timestamp", "timestamp_ntz"):
                df = df.withColumn(
                    col,
                    F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000),
                )
                continue
            raise TypeError(
                f"{table}.{col}: cannot normalize dtype {actual!r} to epoch_ns"
            )
        if actual != target:
            df = df.withColumn(col, F.col(col).cast(target))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Load every driver table as a DataFrame keyed by name, conformed to
    ``EXPECTED_SCHEMA`` regardless of the fixture's physical encoding."""
    # If events.ts is INT64 TIMESTAMP(NANOS) parquet (one historical
    # encoding), vanilla Spark rejects it; read as bigint nanos instead.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The epoch_ns conversion and the DuckDB differential both assume UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return {
        name: _conform(
            spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")), name
        )
        for name in TPCH_TABLES
    }


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view for ``spark.sql`` plans."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
