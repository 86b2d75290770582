"""Toggleable lineage-cut checkpoints.

Operators use eager ``localCheckpoint`` at multi-consumer staging
points and inside iterative loops (lineage truncation — the standard
Spark discipline). Two costs follow from the raw API: the subplan
behind a checkpoint is replaced by an RDD scan, making it INVISIBLE to
plan-level audits, and building the DataFrame executes real jobs.

``maybe_checkpoint`` routes every such call through one switch:
normal runs checkpoint as before; a plan audit (tests/test_plan_lint)
sets ``ENABLED = False`` via :func:`disabled` and gets the full,
un-truncated plan with zero job execution. The switch is process-local
test plumbing, not a tuning knob.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

ENABLED = True

#: incremented on every checkpointed frame — lets a plan audit detect
#: whether a query's construction involved any lineage cut at all
#: (queries that never checkpoint need no second, slower full-plan pass)
CALLS = 0


def maybe_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Eager localCheckpoint, unless checkpointing is disabled for plan
    auditing — then the frame passes through untouched."""
    global CALLS
    CALLS += 1
    if not ENABLED:
        return df
    return df.localCheckpoint(eager=eager)


@contextmanager
def disabled():
    """Context manager: suppress all maybe_checkpoint cuts (plan audits)."""
    global ENABLED
    prev = ENABLED
    ENABLED = False
    try:
        yield
    finally:
        ENABLED = prev
