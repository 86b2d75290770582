"""S3 ↔ catalog reconciliation — both legs.

The reference's bucket-sync sweep diffs the object listing against the
catalog and (a) flags catalog entries whose storage is gone, (b)
get-or-creates catalog records for objects the catalog doesn't know
(fileIndexer.py:1012-1170 auto-registers the asset/file on an S3 event
for an unknown key; sqsBucketSync drives the batch sweep). Both legs
are anti-joins — O(n) with one shuffle each, never a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_in_storage(
    catalog: DataFrame, storage: DataFrame, keys: list[str]
) -> DataFrame:
    """Catalog rows with no backing storage object (the orphan leg)."""
    return catalog.join(storage.select(*keys).distinct(), keys, "left_anti")


def register_candidates(
    catalog: DataFrame, storage: DataFrame, keys: list[str]
) -> DataFrame:
    """Storage objects the catalog doesn't know, projected to minimal
    get-or-create records (fileIndexer.py auto-register: the record is
    derived from the object key — name from the key, counts from the
    listing)."""
    unknown = storage.join(catalog.select(*keys).distinct(), keys, "left_anti")
    return (
        unknown.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.min("file_key").alias("first_key"),
        )
        .withColumn("register_source", F.lit("auto-registered"))
    )
