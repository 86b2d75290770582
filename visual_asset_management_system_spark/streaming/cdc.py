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

TWO COMMIT MODES, one merge plan (``commit_mode`` on every entry
point; everything above the sink — routing, affected-key recompute,
the merge plan itself — is storage-agnostic DataFrame code shared by
both):

- ``"rename"`` (local fast path): touched ``_part=`` directories are
  swapped in place via POSIX rename pairs with a ``.trash`` aside +
  recovery sweep. Atomic and cheap on a real filesystem; NOT safe on
  S3-class object stores, where rename is copy+delete.
- ``"manifest"`` (object-store path, the same protocol lakehouse
  formats use): data directories are IMMUTABLE — each merge writes its
  touched partitions to a fresh ``data/<version>/`` directory and then
  atomically publishes a single small ``_manifest.json`` (one-file
  rename locally ≙ one PUT on S3) mapping partition id → current data
  directory. Readers resolve the manifest; at every instant they see
  either the old or the new complete snapshot, never a mix — no rename
  of data, no trash, no crash window. A crash before the manifest
  commit leaves only unreferenced orphan directories, removed by the
  vacuum sweep at the start of the next merge (production: with a
  retention grace so in-flight readers of recent snapshots finish).
  On a Delta/Iceberg runtime this whole mode collapses into
  ``MERGE INTO`` + the format's own log commit, and ``compact_sink``
  into OPTIMIZE / rewrite-data-files.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

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
    commit_mode: str = "rename",
) -> None:
    """One micro-batch upsert: recompute changed rows, merge into sink.

    ``recompute(keys_df) -> DataFrame`` rebuilds the search rows for the
    given distinct keys (the streaming analog of the full rebuild,
    restricted by semi-join). REMOVE events drop their rows.

    Partial rewrite: only the hash partitions whose keys appear in the
    batch are read, merged, and republished; untouched partitions are
    never opened. The ``collect()`` of touched partition ids is bounded
    by N_SINK_PARTITIONS (≤32 rows). ``commit_mode`` picks how the
    merged partitions become visible: ``"rename"`` (POSIX directory
    swap, local fast path) or ``"manifest"`` (immutable data dirs + an
    atomically-published manifest — the object-store-safe protocol; see
    module docstring).
    """
    spark = batch.sparkSession
    keys = batch.select(*key_cols).distinct()
    removes = (
        batch.filter(F.col("event_name") == "REMOVE").select(*key_cols).distinct()
    )
    fresh = _partition_of(
        recompute(keys).join(removes, list(key_cols), "left_anti"), list(key_cols)
    )

    if commit_mode == "manifest":
        _apply_manifest_merge(spark, keys, fresh, sink_dir, list(key_cols))
        return

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


# ---------------------------------------------------------------------------
# manifest commit mode: immutable data dirs + atomic single-file publish
# ---------------------------------------------------------------------------

MANIFEST_NAME = "_manifest.json"


def _load_manifest(sink_dir: str) -> dict[int, str]:
    """Current snapshot: partition id → sink-relative data directory
    (``data/<version>/_part=<p>``). Missing manifest = empty sink."""
    path = os.path.join(sink_dir, MANIFEST_NAME)
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return {int(k): v for k, v in json.load(f)["parts"].items()}


def _commit_manifest(sink_dir: str, parts: dict[int, str]) -> None:
    """Atomically publish a new snapshot: write the manifest to a temp
    sibling, fsync, and rename onto ``_manifest.json`` — the one-file
    commit point. On an object store this is a single PUT of a small
    object (atomic per-object), which is exactly why all data
    directories are immutable and only this pointer ever changes."""
    os.makedirs(sink_dir, exist_ok=True)
    tmp = os.path.join(sink_dir, f".{MANIFEST_NAME}.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(
            {"parts": {str(k): v for k, v in sorted(parts.items())}}, f
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(sink_dir, MANIFEST_NAME))


def _vacuum_unreferenced(sink_dir: str, parts: dict[int, str]) -> None:
    """Remove data directories the current manifest does not reference:
    orphans from a crash before the commit point, and directories
    superseded by a later commit. Runs at the START of each merge
    (single-writer). A production deployment adds a retention grace
    (lakehouse VACUUM semantics) so readers holding a recent snapshot
    finish before its directories disappear."""
    data_root = os.path.join(sink_dir, "data")
    referenced = {v for v in parts.values()}
    if os.path.isdir(data_root):
        for ver in os.listdir(data_root):
            vdir = os.path.join(data_root, ver)
            if not os.path.isdir(vdir):
                continue
            for d in os.listdir(vdir):
                if d.startswith("_part=") and f"data/{ver}/{d}" not in referenced:
                    shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)
            if not any(d.startswith("_part=") for d in os.listdir(vdir)):
                shutil.rmtree(vdir, ignore_errors=True)
    if os.path.isdir(sink_dir):  # tmp manifests from crashed commits
        for f in os.listdir(sink_dir):
            if f.startswith(f".{MANIFEST_NAME}.tmp-"):
                os.remove(os.path.join(sink_dir, f))


def read_sink(
    spark: SparkSession,
    sink_dir: str,
    commit_mode: str = "rename",
    parts: list[int] | None = None,
) -> DataFrame | None:
    """Read the sink's current snapshot under either commit mode,
    optionally restricted to a set of partition ids (manifest mode
    prunes unlisted directories without opening them — the manifest IS
    the partition index). Returns None when the sink is empty. Manifest
    mode yields the data columns only (``_part`` is directory metadata;
    recompute it from the keys via ``_partition_of`` when needed)."""
    if commit_mode == "rename":
        # emptiness = no partition dirs left (a _SUCCESS marker from the
        # initial full write may survive after every row is removed)
        if not os.path.isdir(sink_dir) or not any(
            d.startswith("_part=") for d in os.listdir(sink_dir)
        ):
            return None
        df = spark.read.parquet(sink_dir)
        return df.filter(F.col("_part").isin(parts)) if parts is not None else df
    man = _load_manifest(sink_dir)
    sel = [v for p, v in sorted(man.items()) if parts is None or p in parts]
    if not sel:
        return None
    return spark.read.parquet(*[os.path.join(sink_dir, v) for v in sel])


def _apply_manifest_merge(
    spark: SparkSession,
    keys: DataFrame,
    fresh: DataFrame,
    sink_dir: str,
    key_cols: list[str],
) -> None:
    """Manifest-mode merge: write the merged touched partitions to an
    immutable ``data/<version>/`` directory, then flip the manifest.

    No crash window: until ``_commit_manifest`` succeeds, readers
    resolve the previous manifest to the previous (complete) snapshot;
    a crash mid-write leaves only an unreferenced version directory for
    the next vacuum. Replay of an at-least-once batch writes a new
    version with identical content and re-commits — idempotent by
    construction. A touched partition whose merged row set is empty
    simply drops out of the manifest (the REMOVE-empties-partition
    case)."""
    man = _load_manifest(sink_dir)
    _vacuum_unreferenced(sink_dir, man)
    touched = sorted(
        r["_part"]
        for r in _partition_of(keys, key_cols).select("_part").distinct().collect()
    )
    merged = fresh
    old = read_sink(spark, sink_dir, "manifest", parts=touched)
    if old is not None:
        surviving = _partition_of(
            old.join(keys, key_cols, "left_anti"), key_cols
        )
        merged = surviving.unionByName(fresh)
    version = uuid.uuid4().hex[:12]
    vdir = os.path.join(sink_dir, "data", version)
    merged.write.partitionBy("_part").mode("overwrite").parquet(vdir)
    written = {
        int(d.split("=", 1)[1])
        for d in os.listdir(vdir)
        if d.startswith("_part=")
    }
    new_man = {p: v for p, v in man.items() if p not in touched}
    for p in sorted(written):
        new_man[p] = f"data/{version}/_part={p}"
    _commit_manifest(sink_dir, new_man)


def compact_sink(
    spark: SparkSession,
    sink_dir: str,
    max_files_per_partition: int = 4,
    commit_mode: str = "rename",
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
    if commit_mode == "manifest":
        man = _load_manifest(sink_dir)
        _vacuum_unreferenced(sink_dir, man)

        def n_files(rel: str) -> int:
            d = os.path.join(sink_dir, rel)
            return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

        crowded = sorted(
            p for p, rel in man.items() if n_files(rel) > max_files_per_partition
        )
        if not crowded:
            return []
        # one job: per-directory reads re-tagged with their partition id
        # (the immutable dirs don't carry _part inside the files)
        rows = None
        for p in crowded:
            part = spark.read.parquet(
                os.path.join(sink_dir, man[p])
            ).withColumn("_part", F.lit(p))
            rows = part if rows is None else rows.unionByName(part)
        version = uuid.uuid4().hex[:12]
        vdir = os.path.join(sink_dir, "data", version)
        rows.repartition("_part").write.partitionBy("_part").mode(
            "overwrite"
        ).parquet(vdir)
        new_man = dict(man)
        for p in crowded:
            new_man[p] = f"data/{version}/_part={p}"
        _commit_manifest(sink_dir, new_man)
        return crowded

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


def compact_batch_sink(
    spark: SparkSession,
    sink_dir: str,
    partition_col: str = "batch",
    max_files_per_partition: int = 4,
) -> list[str]:
    """Small-file compaction for overwrite-by-batch notification sinks
    (the percolate stream layout — each micro-batch owns a
    ``batch=<id>`` directory it idempotently overwrites on replay).
    Every crowded batch directory coalesces to one file via the same
    staged aside-then-promote swap as the CDC merge.

    Batch directory BOUNDARIES are preserved: merging across batches
    would break the sink's replay contract — an at-least-once
    redelivery overwrites exactly its own batch partition, so rows
    folded into a neighbouring directory would survive the rewrite and
    duplicate. Same never-merge-the-replay-key discipline as the gram
    store's tag-excluded compaction (operators/corpus.
    compact_gram_store). Returns the compacted partition dir names."""
    if not os.path.isdir(sink_dir):
        return []
    # recovery first: a crash between the swap's renames leaves a batch
    # dir's only copy in the trash sibling
    trash = sink_dir.rstrip("/") + ".trash"
    if os.path.isdir(trash):
        for d in sorted(os.listdir(trash)):
            dst = os.path.join(sink_dir, d)
            if d.startswith(f"{partition_col}=") and not os.path.isdir(dst):
                os.replace(os.path.join(trash, d), dst)
        shutil.rmtree(trash, ignore_errors=True)
    crowded = []
    for d in os.listdir(sink_dir):
        if not d.startswith(f"{partition_col}="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(sink_dir, d))
            if f.endswith(".parquet")
        ]
        if len(files) > max_files_per_partition:
            crowded.append(d)
    staging = sink_dir.rstrip("/") + ".compact"
    try:
        for d in sorted(crowded):
            out = os.path.join(staging, d)
            spark.read.parquet(os.path.join(sink_dir, d)).coalesce(1).write.mode(
                "overwrite"
            ).parquet(out)
            os.makedirs(trash, exist_ok=True)
            aside = os.path.join(trash, d)
            shutil.rmtree(aside, ignore_errors=True)
            os.replace(os.path.join(sink_dir, d), aside)
            os.replace(out, os.path.join(sink_dir, d))
            shutil.rmtree(aside, ignore_errors=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        try:  # leave no empty trash sibling behind
            os.rmdir(trash)
        except OSError:
            pass
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
    sub: DataFrame,
    sink_dir: str,
    file_keys_of_assets=None,
    commit_mode: str = "rename",
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
    sink = read_sink(spark, sink_dir, commit_mode)
    if sink is not None:
        expanded = sink.select(*key3).join(
            F.broadcast(asset_keys), ["database_id", "asset_id"], "left_semi"
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
    commit_mode: str = "rename",
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
            # (manifest mode has no such window — readers always resolve
            # a complete committed snapshot)
            if commit_mode == "rename":
                _recover_and_sweep_trash(sink_dirs[target])
            sub = _expand_null_path_file_events(
                sub, sink_dirs[target], file_keys_of_assets, commit_mode
            )
        if sub.isEmpty():
            continue
        apply_cdc_batch(
            sub, recomputes[target], sink_dirs[target], key_cols, commit_mode
        )


def start_search_table_stream(
    spark: SparkSession,
    change_log_dir: str,
    sink_dir: str,
    recompute,
    checkpoint_dir: str,
    key_cols: list[str] = ("database_id", "asset_id"),
    trigger_once: bool = True,
    commit_mode: str = "rename",
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
        apply_cdc_batch(batch, recompute, sink_dir, key_cols, commit_mode)

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
    commit_mode: str = "rename",
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
        apply_routed_cdc_batch(
            batch, recomputes, sink_dirs, commit_mode=commit_mode
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
