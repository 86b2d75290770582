"""Version / snapshot operators (SCD-style).

The reference keeps explicit version tables (AssetVersionsStorageTableV2
et al., storageBuilder:1229-1291) and picks the current version by flag
(assetIndexer.py:379-403) or latest S3 version by sort
(fileIndexer.py:544-549). Spark-native form: window row_number picks
(current/latest) and as-of predicates (snapshot reads) over the same
tables — Delta time travel slots in behind the same signatures when a
Delta runtime is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_versions(
    versions: DataFrame,
    entity_keys: list[str] = ("database_id", "asset_id"),
    order_col: str = "date_created",
    version_col: str = "asset_version_id",
) -> DataFrame:
    """One row per entity: its latest version (row_number == 1 pick).

    Ties on the timestamp break on version id desc so the pick is
    deterministic — required for the differential oracle.
    """
    w = Window.partitionBy(*entity_keys).orderBy(
        F.col(order_col).desc(), F.col(version_col).desc()
    )
    return (
        versions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def as_of(
    versions: DataFrame,
    timestamp,
    entity_keys: list[str] = ("database_id", "asset_id"),
    order_col: str = "date_created",
    version_col: str = "asset_version_id",
) -> DataFrame:
    """Snapshot read: the version each entity had at ``timestamp``
    (assetVersions.py:516-664 as-of semantics). Filter-then-pick, so the
    time predicate pushes to the scan before the window shuffle."""
    return latest_versions(
        versions.filter(F.col(order_col) <= F.lit(timestamp)),
        entity_keys,
        order_col,
        version_col,
    )


def snapshot_diff(
    versions: DataFrame,
    t1,
    t2,
    entity_keys: list[str] = ("database_id", "asset_id"),
    order_col: str = "date_created",
    version_col: str = "asset_version_id",
) -> DataFrame:
    """Catalog churn between two snapshot reads: per entity, its
    version at ``t1`` vs at ``t2`` and a status — ``added`` (absent at
    t1), ``removed`` (absent at t2 — only possible when t2 < t1 or
    versions are retracted), ``changed`` (different version id), or
    ``unchanged``. The Delta `DESCRIBE HISTORY`-style diff the
    reference answers by comparing assetVersions reads
    (assetVersions.py:516-664), as one plan: two filter-then-pick
    as-of windows over the SAME version-table scan shape and a
    full-outer join on the entity key — both windows and the join
    share the entity-key partitioning, so the whole diff is one
    exchange of each snapshot."""
    a = as_of(versions, t1, entity_keys, order_col, version_col).select(
        *entity_keys, F.col(version_col).alias("v1")
    )
    b = as_of(versions, t2, entity_keys, order_col, version_col).select(
        *entity_keys, F.col(version_col).alias("v2")
    )
    joined = a.join(b, list(entity_keys), "full_outer")
    status = (
        F.when(F.col("v1").isNull(), F.lit("added"))
        .when(F.col("v2").isNull(), F.lit("removed"))
        .when(F.col("v1") != F.col("v2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*entity_keys, "v1", "v2", status.alias("status"))
