"""Workflow / pipeline runner — linear DAG of DataFrame transforms.

The reference compiles an ordered list of pipelines into a linear Step
Functions state machine with retry/catch per task
(common/stepfunctions_builder.py:161-203, 316-525) where each pipeline
is arbitrary user compute over one asset's files. The Spark-native
re-expression: a Pipeline is a registered ``f(DataFrame, ctx) ->
DataFrame`` transform (pandas-UDF/`mapInPandas` stages for heavy per-row
compute), and a Workflow is their ordered composition with per-stage
retry policy and an execution log.

This keeps the reference's extensibility contract (UDF/UDTF surface,
SURVEY §2.10) while the execution is one Spark job — each stage stays
lazy, so Catalyst optimizes *across* pipeline boundaries (e.g. a
filter in stage 3 pushes below stage 1's projection).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Pipeline:
    """One named transform stage; ``fn(df, ctx) -> df``."""

    name: str
    fn: Callable[[DataFrame, dict], DataFrame]
    max_retries: int = 2          # reference default retry/catch config
    retry_backoff_s: float = 0.0  # 0 in tests; exponential on a cluster


@dataclass
class WorkflowExecution:
    execution_id: str
    workflow_name: str
    stages: list[dict] = field(default_factory=list)
    status: str = "RUNNING"
    # the asset/file the execution was launched against — the reference's
    # 'databaseId:assetId' partition key + inputAssetFileKey LSI column
    # (executeWorkflow.py:394-420)
    database_id: str | None = None
    asset_id: str | None = None
    file_key: str | None = None


class Workflow:
    """Ordered composition of pipelines (linear chain — auto Next/End)."""

    def __init__(self, name: str, pipelines: list[Pipeline]) -> None:
        self.name = name
        self.pipelines = pipelines
        self.executions: list[WorkflowExecution] = []

    def run(self, df: DataFrame, ctx: dict | None = None) -> DataFrame:
        ctx = dict(ctx or {})
        # deterministic sequential ids (the reference's SFN execution name
        # is caller-supplied; sequence numbers keep the log replayable).
        # Zero-padded so the newest-first listing's string ordering agrees
        # with numeric ordering past 9 executions.
        execution = WorkflowExecution(
            execution_id=f"{self.name}_exec_{len(self.executions) + 1:06d}",
            workflow_name=self.name,
            database_id=ctx.get("database_id"),
            asset_id=ctx.get("asset_id"),
            file_key=ctx.get("file_key"),
        )
        self.executions.append(execution)
        out = df
        for stage in self.pipelines:
            attempt = 0
            while True:
                t0 = time.time()
                try:
                    out = stage.fn(out, ctx)
                    execution.stages.append(
                        {
                            "pipeline": stage.name,
                            "status": "SUCCEEDED",
                            "attempts": attempt + 1,
                            "seconds": round(time.time() - t0, 3),
                        }
                    )
                    break
                except Exception as exc:  # retry/catch per task state
                    attempt += 1
                    if attempt > stage.max_retries:
                        execution.stages.append(
                            {
                                "pipeline": stage.name,
                                "status": "FAILED",
                                "attempts": attempt,
                                "error": repr(exc),
                            }
                        )
                        execution.status = "FAILED"
                        raise
                    if stage.retry_backoff_s:
                        time.sleep(stage.retry_backoff_s * (2 ** (attempt - 1)))
        execution.status = "SUCCEEDED"
        return out

    def executions_df(self, spark: SparkSession) -> DataFrame:
        """The execution log as a queryable DataFrame — the Spark analog
        of WorkflowExecutionsStorageTable (executeWorkflow.py:394-487).
        Wall-clock stage timings stay in the in-memory log; the table
        carries the replay-stable columns."""
        rows = [
            (
                e.execution_id,
                e.workflow_name,
                e.status,
                e.database_id,
                e.asset_id,
                e.file_key,
                len(e.stages),
                sum(s.get("attempts", 0) for s in e.stages),
            )
            for e in self.executions
        ]
        schema = (
            "execution_id string, workflow_name string, status string, "
            "database_id string, asset_id string, file_key string, "
            "n_stages int, n_attempts int"
        )
        return spark.createDataFrame(rows, schema)


def list_executions(
    executions: DataFrame,
    database_id: str,
    asset_id: str,
    file_key: str | None = None,
    max_items: int = 500,
) -> DataFrame:
    """Keyed execution listing (executeWorkflow.py:394-487): partition-key
    equality on (database_id, asset_id), optional inputAssetFileKey
    filter, newest-first (ScanIndexForward=False), page cap 500."""
    df = executions.filter(
        (F.col("database_id") == database_id) & (F.col("asset_id") == asset_id)
    )
    if file_key is not None:
        df = df.filter(F.col("file_key") == file_key)
    return df.orderBy(F.col("execution_id").desc()).limit(max_items)


#: sidecar suffixes the output processor dispatches on
#: (processWorkflowExecutionOutput.py:270-301)
_MD_SUFFIX = ".metadata.json"
_AB_SUFFIX = ".attribute.json"


def ingest_workflow_outputs(outputs: DataFrame) -> dict[str, DataFrame]:
    """Dispatch pipeline output objects into the three ingestion legs
    (processWorkflowExecutionOutput.py): data files append to the files
    table; ``*.metadata.json`` sidecars become file-level MD_ EAV rows;
    ``*.attribute.json`` sidecars become AB_ attribute EAV rows — the
    sidecar's JSON object is exploded to one row per key, targeting the
    file whose name remains after stripping the suffix
    (extract_file_path_from_metadata_filename). Folder markers are
    dropped. All legs re-enter CDC like any other write.

    ``outputs`` needs (database_id, asset_id, file_key, content) where
    ``content`` is the sidecar JSON text (NULL for data files); any
    extra columns ride along on the files leg. Pure Column ops — one
    pass, three filtered projections, no shuffle.
    """
    key = F.col("file_key")
    is_marker = key.endswith("/")
    is_md = key.endswith(_MD_SUFFIX)
    is_ab = key.endswith(_AB_SUFFIX)
    files_leg = outputs.filter(~is_marker & ~is_md & ~is_ab).drop("content")

    def _eav(flag, suffix: str, k: str, v: str) -> DataFrame:
        target = F.expr(
            f"substring(file_key, 1, length(file_key) - {len(suffix)})"
        )
        return (
            outputs.filter(~is_marker & flag)
            .select(
                "database_id",
                "asset_id",
                target.alias("file_key"),
                F.explode(
                    F.from_json("content", "map<string,string>")
                ).alias(k, v),
            )
        )

    return {
        "files": files_leg,
        "file_metadata": _eav(is_md, _MD_SUFFIX, "metadata_key", "metadata_value"),
        "file_attributes": _eav(is_ab, _AB_SUFFIX, "attribute_key", "attribute_value"),
    }


def auto_execute_triggers(
    file_events: DataFrame, workflows: DataFrame
) -> DataFrame:
    """New-file upload → workflow execution requests
    (sqsAutoExecuteWorkflow.py:146-331): join uploads to the workflows
    registered for their database (tiny dimension → broadcast) and keep
    the pairs whose ``auto_trigger_extensions`` ('.all' or a
    comma-delimited lowercase list) match the file extension. Returns
    one execution request per (workflow, file)."""
    exts = F.col("auto_trigger_extensions")
    match = (exts == ".all") | F.concat(F.lit(","), exts, F.lit(",")).contains(
        F.concat(F.lit(","), F.lower(F.col("file_ext")), F.lit(","))
    )
    return (
        file_events.join(F.broadcast(workflows), "database_id")
        .filter(exts.isNotNull() & (exts != "") & match)
        .select(
            "workflow_id",
            "database_id",
            "asset_id",
            "file_key",
            F.lit("auto-trigger").alias("trigger_source"),
        )
    )
