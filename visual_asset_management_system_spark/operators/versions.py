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
