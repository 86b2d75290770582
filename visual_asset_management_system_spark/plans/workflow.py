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
import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


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


class Workflow:
    """Ordered composition of pipelines (linear chain — auto Next/End)."""

    def __init__(self, name: str, pipelines: list[Pipeline]) -> None:
        self.name = name
        self.pipelines = pipelines
        self.executions: list[WorkflowExecution] = []

    def run(self, df: DataFrame, ctx: dict | None = None) -> DataFrame:
        ctx = dict(ctx or {})
        execution = WorkflowExecution(
            execution_id=str(uuid.uuid4()), workflow_name=self.name
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
