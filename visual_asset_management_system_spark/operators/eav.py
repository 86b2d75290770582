"""EAV metadata operators.

The reference stores metadata as narrow rows keyed by
``metadataKey / databaseId:assetId:filePath``
(AssetFileMetadataStorageTableV2; metadataService.py:1460-1479) and
collects them into a flat ``MD_`` object at indexing time
(assetIndexer.py:339-377, models/indexing.py:154-172).

Spark-native forms:
- ``metadata_map``   — map<string,string> per entity (the MD_ object):
  one shuffle (groupBy entity keys), map-side combinable.
- ``pivot_metadata`` — wide column-per-key form for a *known* key set;
  passing ``keys`` explicitly avoids Spark's two-pass pivot (the first
  pass is a distinct scan of all keys — at 100 TB that's a full extra
  shuffle worth avoiding; the reference caps keys at 500/entity anyway).

Last-write-wins: multiple writers per (entity, key) resolve with max()
by default — the deterministic stand-in for the reference's
last-writer-wins stream ordering (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metadata_map(
    metadata: DataFrame,
    entity_keys: list[str] = ("database_id", "asset_id"),
    key_col: str = "metadata_key",
    value_col: str = "metadata_value",
    out_col: str = "metadata",
) -> DataFrame:
    """Collapse EAV rows into one map column per entity."""
    deduped = metadata.groupBy(*entity_keys, key_col).agg(
        F.max(value_col).alias(value_col)
    )
    return deduped.groupBy(*entity_keys).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(key_col), F.col(value_col)))
        ).alias(out_col)
    )


def validate_metadata(
    metadata: DataFrame,
    schemas: DataFrame,
    entity_keys: list[str] = ("database_id", "asset_id"),
) -> DataFrame:
    """Schema-validation operator: metadata vs declared schemas →
    violation rows (database_id, asset_id, metadata_key, violation).

    Mirrors common/metadataSchemaValidation.py semantics declaratively:
    - ``not_in_controlled_list`` — value outside the schema's allowed set
      (comma-delimited list; membership via delimiter-wrapped contains);
    - ``bad_type`` — declared ``date`` value that fails to parse;
    - ``missing_required`` — entity lacks a required key entirely.

    Scale shape: schemas is a tiny dimension (broadcast); the latest-
    value dedup shuffles once on the entity key; missing-required is a
    broadcast cross join of distinct entities × required keys followed
    by an anti-join — O(entities × required_keys), never O(metadata²).
    """
    keys = list(entity_keys)
    latest = metadata.groupBy(*keys, "metadata_key").agg(
        F.max("metadata_value").alias("metadata_value")
    )
    joined = latest.join(F.broadcast(schemas), "metadata_key")
    wrapped = lambda c: F.concat(F.lit(","), c, F.lit(","))  # noqa: E731
    not_allowed = joined.filter(
        F.col("allowed_values").isNotNull()
        & ~wrapped(F.col("allowed_values")).contains(
            wrapped(F.col("metadata_value"))
        )
    ).select(*keys, "metadata_key", F.lit("not_in_controlled_list").alias("violation"))
    bad_type = joined.filter(
        (F.col("value_type") == "date")
        & F.col("metadata_value").try_cast("date").isNull()
    ).select(*keys, "metadata_key", F.lit("bad_type").alias("violation"))
    entities = metadata.select(*keys).distinct()
    required = schemas.filter(F.col("required")).select("metadata_key")
    missing = (
        entities.crossJoin(F.broadcast(required))
        .join(latest.select(*keys, "metadata_key"), [*keys, "metadata_key"], "left_anti")
        .select(*keys, "metadata_key", F.lit("missing_required").alias("violation"))
    )
    return not_allowed.unionByName(bad_type).unionByName(missing)


def pivot_metadata(
    metadata: DataFrame,
    keys: list[str],
    entity_keys: list[str] = ("database_id", "asset_id"),
    key_col: str = "metadata_key",
    value_col: str = "metadata_value",
) -> DataFrame:
    """Wide form: one column per metadata key (explicit key list)."""
    return (
        metadata.groupBy(*entity_keys)
        .pivot(key_col, keys)
        .agg(F.max(value_col))
    )
