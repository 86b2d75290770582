"""Bucketed catalog storage — shuffle-free co-located joins.

The engine's hottest join keys are the entity keys: files↔assets on
(database_id, asset_id) for the file search build, metadata↔entities
for the EAV map, versions↔assets for as-of reads. At 100 TB both sides
of those joins are big, so the sort-merge join's two shuffles become
the dominant cost. Writing the catalog tables BUCKETED on the entity
key (hash-bucketed + sorted within buckets, Spark `bucketBy`) makes the
join co-located: Catalyst sees matching output partitionings and plans
a SortMergeJoin with NO Exchange on either side — the same layout a
Delta/Iceberg deployment gets from clustering keys.

Bucket count is a layout constant (same for every table sharing the
key) — choose it for the target cluster (e.g. 4× total cores), not the
current data size; AQE cannot change it after write.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def drop_table(spark: SparkSession, table_name: str, managed: bool = True) -> None:
    """DROP TABLE IF EXISTS, plus — for managed tables — clear any
    orphaned warehouse location: the location can survive from a
    PREVIOUS process (the in-memory catalog forgets it, the warehouse
    dir doesn't) and ``saveAsTable`` refuses to reuse it.

    Unqualified names only: the orphan path below assumes the default
    database's ``warehouse/<name>`` layout, which is wrong for
    ``db.tbl`` (actual layout ``warehouse/db.db/tbl``) — a qualified
    name would rmtree nothing and leave saveAsTable failing."""
    if "." in table_name:
        raise ValueError(
            "drop_table handles unqualified (default-database) names "
            f"only; got {table_name!r} — the managed-location cleanup "
            "assumes the warehouse/<name> layout"
        )
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if managed:
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(
            os.path.join(warehouse, table_name.lower()), ignore_errors=True
        )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted table (overwriting any
    previous version). ``path`` makes it external; otherwise it lands in
    the session warehouse."""
    spark = df.sparkSession
    drop_table(spark, table_name, managed=path is None)
    writer = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_keys)
        .sortBy(*bucket_keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back; joins between tables bucketed on the
    same keys/count plan with no Exchange."""
    return spark.table(table_name)
