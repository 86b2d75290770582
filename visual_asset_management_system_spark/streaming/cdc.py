"""CDC pipeline: change-log stream → denormalized search-table upserts.

The reference's indexing layer (handlers/indexing/, ~5,900 LoC) consumes
DynamoDB Streams + S3 events and rebuilds one search document per
changed entity, idempotently, last-writer-wins (assetIndexer.py:602-823).
The Spark-native re-expression is kappa-style:

    change_log (file/kafka stream of INSERT|MODIFY|REMOVE rows)
      → readStream → foreachBatch:
          route        = dispatch each event to its target index(es)
                         (assetIndexer.py:1002-1110), expanding derived
                         triggers (a link change re-indexes BOTH endpoint
                         assets, assetIndexer.py:921-996) and dropping
                         filtered events (folder markers, excluded
                         prefixes — fileIndexer.py:879-912)
          affected keys = distinct entity keys in the micro-batch
          recompute    = same joins as the batch rebuild, restricted to
                         those keys (semi-join — incremental, not full)
          merge        = key-partitioned upsert (REMOVE deletes)

Identical code does the full rebuild (crReindexer equivalent): the
batch builders in operators.search_tables ARE the recompute step; this
module adds the merge sink and the stream wrapper. With a Delta runtime
the merge becomes ``MERGE INTO``; on plain parquet the merge rewrites
ONLY the hash-partition directories whose keys appear in the batch —
work per micro-batch is O(touched partitions), never O(table). The
per-directory swap is the non-transactional analog of dynamic partition
overwrite; a crash mid-swap leaves other partitions intact and the
at-least-once replay + idempotent recompute repairs the touched one.

Object-store deployment note (100 TB): the swap primitive here
(``_swap_partition_dir`` + ``_recover_and_sweep_trash``) relies on
POSIX ``rename`` atomicity, which S3/GCS-style object stores do not
provide. The production mapping is one-to-one onto a lakehouse table
format's transactional commit:

    merged micro-batch write   → ``MERGE INTO sink USING batch ON keys``
                                 (Delta/Iceberg/Hudi — copy-on-write of
                                 exactly the touched files, like our
                                 touched-partition rewrite)
    _swap_partition_dir        → the format's atomic manifest/log commit
                                 (no rename pair, no crash window)
    _recover_and_sweep_trash   → unnecessary (commit is all-or-nothing);
                                 orphaned staged files are handled by
                                 VACUUM / expire-snapshots
    compact_sink               → OPTIMIZE / rewrite-data-files

Everything above the sink (routing, affected-key recompute, the merge
plan itself) is storage-agnostic DataFrame code and transfers as-is;
only the ~60 lines of directory-swap plumbing are the local-filesystem
stand-in for that commit protocol.
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

#: extended schema for the routed pipeline: file/metadata events carry a
#: file_path, link events carry the second endpoint.
ROUTED_CHANGE_LOG_SCHEMA = (
    CHANGE_LOG_SCHEMA
    + ", file_path string, to_database_id string, to_asset_id string"
)

#: S3-event exclusion rules (fileIndexer.py:879-912): folder markers and
#: non-indexable prefixes (pipeline scratch, previews, temp uploads).
EXCLUDED_KEY_PREFIXES = ("pipelines/", "previews/", "temp-uploads/")


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

    Partial rewrite: only the hash-partition directories whose keys
    appear in the batch are read, merged, and swapped; untouched
    directories are never opened. The ``collect()`` of touched partition
    ids is bounded by N_SINK_PARTITIONS (≤32 rows).
    """
    spark = batch.sparkSession
    keys = batch.select(*key_cols).distinct()
    removes = (
        batch.filter(F.col("event_name") == "REMOVE").select(*key_cols).distinct()
    )
    fresh = _partition_of(
        recompute(keys).join(removes, list(key_cols), "left_anti"), list(key_cols)
    )

    # recover BEFORE the fresh-sink check: a crash can leave the sink's
    # only _part directory in .trash with the live dir missing — without
    # recovery first, an empty-looking sink would be fully overwritten
    # (surviving rows never restored) and the stale trash could later
    # resurrect an outdated partition
    _recover_and_sweep_trash(sink_dir)

    if not os.path.isdir(sink_dir) or not os.listdir(sink_dir):
        fresh.write.partitionBy("_part").mode("overwrite").parquet(sink_dir)
        return

    touched = sorted(
        r["_part"]
        for r in _partition_of(keys, list(key_cols)).select("_part").distinct().collect()
    )
    existing_touched = spark.read.parquet(sink_dir).filter(
        F.col("_part").isin(touched)
    )
    # merged = surviving old rows of touched partitions + fresh rows;
    # fresh keys hash into touched partitions by construction.
    merged = existing_touched.join(keys, list(key_cols), "left_anti").unionByName(
        fresh
    )

    staging = sink_dir.rstrip("/") + ".staging"
    merged.write.partitionBy("_part").mode("overwrite").parquet(staging)
    try:
        for p in touched:
            _swap_partition_dir(staging, sink_dir, p)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _recover_and_sweep_trash(sink_dir: str) -> list[int]:
    """Recover from, then clear, the swap's ``.trash`` sibling.

    A crash between ``_swap_partition_dir``'s two renames leaves a
    partition's only copy in the trash with its live directory missing;
    a crash after promotion leaves a stale aside. Run at the start of
    every merge/compaction: asides whose live ``_part=`` directory is
    missing are restored (the in-window crash — without this, the
    at-least-once replay would read the sink WITHOUT the partition's
    surviving rows and silently drop them), everything else is swept,
    so trash never accumulates across batches (previously a stale aside
    for a partition never touched again leaked forever). Returns the
    restored partition ids."""
    trash = sink_dir.rstrip("/") + ".trash"
    if not os.path.isdir(trash):
        return []
    restored = []
    for d in sorted(os.listdir(trash)):
        if not d.startswith("_part="):
            continue
        dst = os.path.join(sink_dir, d)
        if not os.path.isdir(dst):
            os.makedirs(sink_dir, exist_ok=True)
            os.replace(os.path.join(trash, d), dst)
            restored.append(int(d.split("=", 1)[1]))
    shutil.rmtree(trash, ignore_errors=True)
    return restored


def _swap_partition_dir(staging: str, sink_dir: str, p: int) -> None:
    """Crash-resilient partition swap: the live directory moves ASIDE
    (to a ``.trash`` sibling OUTSIDE the sink, so partition discovery
    never sees it) before the staged one is promoted — at no instant has
    the only copy of surviving rows been deleted, which a
    rmtree-then-rename swap cannot guarantee (untouched keys of the
    partition would be unrecoverable: their events were not in the
    batch, so at-least-once replay cannot rebuild them). A crash between
    the two renames leaves the partition in the trash, and
    ``_recover_and_sweep_trash`` restores it automatically at the start
    of the replayed merge; plain parquet cannot make the pair atomic —
    a lakehouse table format (MERGE) is the transactional deployment
    path."""
    src = os.path.join(staging, f"_part={p}")
    dst = os.path.join(sink_dir, f"_part={p}")
    trash = sink_dir.rstrip("/") + ".trash"
    os.makedirs(trash, exist_ok=True)
    aside = os.path.join(trash, f"_part={p}")
    shutil.rmtree(aside, ignore_errors=True)  # stale from a prior crash
    if os.path.isdir(dst):
        os.replace(dst, aside)
    if os.path.isdir(src):
        os.replace(src, dst)
    # else: every row of partition p was deleted → dir stays gone
    shutil.rmtree(aside, ignore_errors=True)
    try:  # leave no empty trash sibling behind when this was the last aside
        os.rmdir(trash)
    except OSError:
        pass


def compact_sink(
    spark: SparkSession,
    sink_dir: str,
    max_files_per_partition: int = 4,
) -> list[int]:
    """Small-file compaction for the CDC sink — the OPTIMIZE half of the
    partial-rewrite story: every micro-batch rewrite adds files to its
    touched ``_part`` directories, and read amplification grows with
    file count. Rewrites ONLY the partitions whose file count exceeds
    the threshold (each coalesced to one file via the same staged-swap
    the merge uses), leaving compact partitions untouched. Returns the
    compacted partition ids.

    On a lakehouse runtime this is ``OPTIMIZE``/rewrite-data-files; on
    plain parquet it is a maintenance job scheduled off the write path.
    """
    # Recovery FIRST: a crash between the swap's renames can leave a
    # partition's only copy in the .trash sibling while the live sink
    # dir itself is absent — an early return on isdir would skip it.
    _recover_and_sweep_trash(sink_dir)
    if not os.path.isdir(sink_dir):
        return []
    crowded = []
    for d in os.listdir(sink_dir):
        if not d.startswith("_part="):
            continue
        files = [
            f for f in os.listdir(os.path.join(sink_dir, d))
            if f.endswith(".parquet")
        ]
        if len(files) > max_files_per_partition:
            crowded.append(int(d.split("=", 1)[1]))
    if not crowded:
        return []
    rows = spark.read.parquet(sink_dir).filter(F.col("_part").isin(crowded))
    staging = sink_dir.rstrip("/") + ".compact"
    rows.repartition("_part").write.partitionBy("_part").mode(
        "overwrite"
    ).parquet(staging)
    try:
        for p in crowded:
            _swap_partition_dir(staging, sink_dir, p)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return sorted(crowded)


# ---------------------------------------------------------------------------
# change routing, derived triggers, event filtering
# ---------------------------------------------------------------------------

def filter_events(batch: DataFrame) -> DataFrame:
    """Drop non-indexable events (fileIndexer.py:879-912): S3 folder
    markers (keys ending '/') and excluded prefixes (pipeline outputs,
    previews, temp uploads). Pure stream filter — runs before routing."""
    path = F.coalesce(F.col("file_path"), F.lit(""))
    rel = F.regexp_replace(path, r"^/", "")
    is_s3 = F.col("source").isin("s3", "files")
    is_folder_marker = path.endswith("/")
    excluded = F.lit(False)
    for p in EXCLUDED_KEY_PREFIXES:
        excluded = excluded | rel.startswith(p)
    return batch.filter(~(is_s3 & (is_folder_marker | excluded)))


def route_changes(batch: DataFrame) -> DataFrame:
    """Dispatch one change-log micro-batch to its target index(es).

    Returns (target, event_name, database_id, asset_id, file_path) where
    target ∈ {'asset', 'file'}:

    - ``assets`` rows        → asset index for that asset;
    - ``metadata`` rows      → asset index iff file_path == '/'
      (assetIndexer.py:892-900), else file index for that file;
    - ``asset_links`` rows   → derived trigger: BOTH endpoint assets
      re-indexed (assetIndexer.py:921-996). A link INSERT/MODIFY/REMOVE
      is always an upsert of the endpoints (their flag columns change,
      the assets themselves still exist), so event_name maps to MODIFY;
    - ``s3``/``files`` rows  → file index (after filter_events).
    """
    batch = filter_events(batch)
    src = F.col("source")
    path = F.coalesce(F.col("file_path"), F.lit("/"))

    assets = batch.filter(src == "assets").select(
        F.lit("asset").alias("target"),
        F.col("event_name"),
        F.col("database_id"),
        F.col("asset_id"),
        F.lit(None).cast("string").alias("file_path"),
    )
    md = batch.filter(src == "metadata")
    md_asset = md.filter(path == "/").select(
        F.lit("asset").alias("target"),
        F.col("event_name"),
        F.col("database_id"),
        F.col("asset_id"),
        F.lit(None).cast("string").alias("file_path"),
    )
    md_file = md.filter(path != "/").select(
        F.lit("file").alias("target"),
        F.col("event_name"),
        F.col("database_id"),
        F.col("asset_id"),
        F.col("file_path"),
    )
    links = batch.filter(src == "asset_links")
    link_from = links.select(
        F.lit("asset").alias("target"),
        F.lit("MODIFY").alias("event_name"),
        F.col("database_id"),
        F.col("asset_id"),
        F.lit(None).cast("string").alias("file_path"),
    )
    link_to = links.select(
        F.lit("asset").alias("target"),
        F.lit("MODIFY").alias("event_name"),
        F.col("to_database_id").alias("database_id"),
        F.col("to_asset_id").alias("asset_id"),
        F.lit(None).cast("string").alias("file_path"),
    )
    file_events = batch.filter(src.isin("s3", "files")).select(
        F.lit("file").alias("target"),
        F.col("event_name"),
        F.col("database_id"),
        F.col("asset_id"),
        F.col("file_path"),
    )
    return (
        assets.unionByName(md_asset)
        .unionByName(md_file)
        .unionByName(link_from)
        .unionByName(link_to)
        .unionByName(file_events)
    )


def _expand_null_path_file_events(
    sub: DataFrame, sink_dir: str, file_keys_of_assets=None
) -> DataFrame:
    """Expand file-target events with NULL file_path to explicit file
    keys at the asset grain.

    File-index keys include file_path, and equi-joins never match NULL
    keys — without expansion a NULL-path event is consumed as a silent
    no-op (neither the left-semi recompute nor the left-anti delete
    sees it). A NULL path means "something about this asset's files
    changed, path unknown" → re-index every file of the asset: expand
    to the union of (a) the file keys already in the sink for those
    assets (covers updates and vanished files — the recompute returns
    no row for a gone file, so the merge drops it) and (b) the keys
    ``file_keys_of_assets(asset_keys)`` reports from the source of
    truth (covers brand-new files the sink has never seen). A NULL-path
    REMOVE becomes a REMOVE of every expanded key. The sink key scan
    reads three dictionary-encoded columns, semi-joined by a broadcast
    of the (tiny) affected-asset set — NULL-path events are the rare
    case, the scan is not per-batch overhead."""
    nullp = sub.filter(F.col("file_path").isNull())
    withp = sub.filter(F.col("file_path").isNotNull())
    if nullp.isEmpty():
        return withp
    spark = sub.sparkSession
    flags = nullp.groupBy("database_id", "asset_id").agg(
        F.max((F.col("event_name") == "REMOVE").cast("int")).alias("_rm")
    )
    asset_keys = flags.select("database_id", "asset_id")
    key3 = ["database_id", "asset_id", "file_path"]
    expanded: DataFrame | None = None
    if os.path.isdir(sink_dir) and os.listdir(sink_dir):
        expanded = (
            spark.read.parquet(sink_dir)
            .select(*key3)
            .join(F.broadcast(asset_keys), ["database_id", "asset_id"], "left_semi")
        )
    if file_keys_of_assets is not None:
        src_keys = file_keys_of_assets(asset_keys).select(*key3)
        expanded = src_keys if expanded is None else expanded.unionByName(src_keys)
    if expanded is None:
        return withp
    events = (
        expanded.distinct()
        .join(F.broadcast(flags), ["database_id", "asset_id"])
        .select(
            F.lit("file").alias("target"),
            F.when(F.col("_rm") == 1, F.lit("REMOVE"))
            .otherwise(F.lit("MODIFY"))
            .alias("event_name"),
            *key3,
        )
    )
    return withp.unionByName(events)


def apply_routed_cdc_batch(
    batch: DataFrame,
    recomputes: dict[str, object],
    sink_dirs: dict[str, str],
    file_keys_of_assets=None,
) -> None:
    """Routed micro-batch: dispatch events per target index, then run the
    partial-rewrite merge per target. ``recomputes``/``sink_dirs`` map
    target ('asset' / 'file') → recompute fn / sink directory.

    Asset-index keys are (database_id, asset_id); file-index keys add
    file_path. File events whose path is unknown (NULL) are expanded to
    the asset's known file keys (see ``_expand_null_path_file_events``);
    ``file_keys_of_assets`` optionally supplies the source-of-truth
    file listing for an asset-key set so the expansion also reaches
    files the sink has never indexed.
    """
    routed = route_changes(batch)
    for target, key_cols in (
        ("asset", ["database_id", "asset_id"]),
        ("file", ["database_id", "asset_id", "file_path"]),
    ):
        if target not in sink_dirs:
            continue
        sub = routed.filter(F.col("target") == target)
        if target == "file":
            # recover before the expansion CAPTURES the sink's file-key
            # listing: after an in-window crash, a replayed NULL-path
            # event's expansion must see the file keys of the
            # still-trashed partition, or those files are never
            # re-indexed/deleted and stale index rows survive silently
            _recover_and_sweep_trash(sink_dirs[target])
            sub = _expand_null_path_file_events(
                sub, sink_dirs[target], file_keys_of_assets
            )
        if sub.isEmpty():
            continue
        apply_cdc_batch(sub, recomputes[target], sink_dirs[target], key_cols)


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


def start_routed_stream(
    spark: SparkSession,
    change_log_dir: str,
    sink_dirs: dict[str, str],
    recomputes: dict[str, object],
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Routed variant: one change-log stream feeding BOTH search tables
    through route_changes (the full assetIndexer/fileIndexer dispatch)."""
    stream = (
        spark.readStream.schema(ROUTED_CHANGE_LOG_SCHEMA)
        .format("json")
        .load(change_log_dir)
    )

    def handle(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_routed_cdc_batch(batch, recomputes, sink_dirs)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
