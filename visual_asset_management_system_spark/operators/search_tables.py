"""Denormalized search-table builders (the engine's "indexes").

The reference maintains two OpenSearch indexes as materialized
denormalizations: asset docs embed metadata + relationship flags
(assetIndexer.py:469-528, 405-454) and file docs embed the parent
asset's name/tags (fileIndexer.py:613-665). Here the same derived
tables are built as ONE declarative batch plan each — the crReindexer
full-rebuild equivalent (crReindexer.py:92-1083); the streaming job
(streaming/cdc.py) incrementally maintains the same schema.

Scale notes:
- buckets / link-flag aggregates are small → broadcast joins;
- the metadata map agg shuffles once on the entity key, the same key
  the subsequent join uses, so AQE reuses the partitioning;
- relationship flags are computed as ONE aggregation over the union of
  both edge directions instead of the reference's 4 existence probes
  per asset (assetIndexer.py:405-441) — O(edges), not O(assets×4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .eav import metadata_map


def relationship_flags(asset_links: DataFrame) -> DataFrame:
    """Per-asset booleans: has_asset_children / parents / related.

    One pass over the edges: tag each endpoint with its role, union,
    aggregate with max(case...) — the map-side-combinable form.
    """
    out_edges = asset_links.select(
        F.col("from_database_id").alias("database_id"),
        F.col("from_asset_id").alias("asset_id"),
        F.col("relationship_type"),
        F.lit("out").alias("direction"),
    )
    in_edges = asset_links.select(
        F.col("to_database_id").alias("database_id"),
        F.col("to_asset_id").alias("asset_id"),
        F.col("relationship_type"),
        F.lit("in").alias("direction"),
    )
    edges = out_edges.unionByName(in_edges)
    is_pc = F.col("relationship_type") == "parentChild"
    return edges.groupBy("database_id", "asset_id").agg(
        F.max(F.when(is_pc & (F.col("direction") == "out"), True).otherwise(False)
              ).alias("has_asset_children"),
        F.max(F.when(is_pc & (F.col("direction") == "in"), True).otherwise(False)
              ).alias("has_asset_parents"),
        F.max(F.when(~is_pc, True).otherwise(False)).alias("has_assets_related"),
    )


def build_search_assets(
    assets: DataFrame,
    buckets: DataFrame,
    metadata: DataFrame,
    asset_links: DataFrame | None = None,
) -> DataFrame:
    """The asset search document table (models/indexing.py:221-300)."""
    md = metadata_map(metadata.filter(F.col("file_path") == "/"))
    df = (
        assets.withColumn("tags", F.array("tag1", "tag2"))
        .join(F.broadcast(buckets), "bucket_id", "left")
        .join(md, ["database_id", "asset_id"], "left")
    )
    if asset_links is not None:
        flags = relationship_flags(asset_links)
        df = df.join(flags, ["database_id", "asset_id"], "left").na.fill(
            {
                "has_asset_children": False,
                "has_asset_parents": False,
                "has_assets_related": False,
            }
        )
    return df


def build_search_files(
    files: DataFrame,
    assets: DataFrame,
    file_metadata: DataFrame | None = None,
    file_attributes: DataFrame | None = None,
) -> DataFrame:
    """The file search document table: file rows enriched with the parent
    asset's name and tags (fileIndexer.py:323-341, 613-665), the file-level
    metadata map (the ``MD_`` flat object — models/indexing.py:154-172,
    file-path-keyed rows per assetIndexer.py:892-900) and the pipeline
    attribute map (``AB_`` — models/indexing.py:174-192).

    N:1 equi-join on (database_id, asset_id); the asset side is the
    smaller dimension — at 100 TB both sides are big, so this is a sort-
    merge join on the co-partitioned key; with bucketed storage it's
    shuffle-free. The metadata/attribute map aggregations shuffle on the
    same (database_id, asset_id, file_key) the join uses, so AQE reuses
    the partitioning."""
    asset_dim = assets.select(
        "database_id",
        "asset_id",
        F.col("asset_name"),
        F.array("tag1", "tag2").alias("tags"),
    )
    df = files.join(asset_dim, ["database_id", "asset_id"], "left")
    file_keys = ["database_id", "asset_id", "file_key"]
    if file_metadata is not None:
        md = metadata_map(file_metadata, entity_keys=file_keys)
        df = df.join(md, file_keys, "left")
    if file_attributes is not None:
        ab = metadata_map(
            file_attributes,
            entity_keys=file_keys,
            key_col="attribute_key",
            value_col="attribute_value",
            out_col="attributes",
        )
        df = df.join(ab, file_keys, "left")
    return df
