"""Row-level ABAC: compile constraint rows into a Column predicate.

The reference enforces Casbin policies per search hit / listed row
(search.py:1711-1737; authz/__init__.py:387-559 compiles
ConstraintsStorageTable rows into Casbin model text). The Spark-native
design compiles the SAME constraint rows into one boolean Column so
authorization runs *inside* the plan, before limits (killing the
reference's ×2 over-fetch buffer) and fully pushdown-eligible.

Constraint row shape (FIXTURES.md §4): object_type, permissions[],
effect (allow/deny), criteria[] of (field, operator, value) where field
∈ {database_id, asset_name, asset_type, tags} and operator ∈
{equals, contains, starts_with, is_in}. Semantics mirror Casbin's
allow-override-with-deny: allowed iff ≥1 allow matches AND no deny
matches.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Criterion:
    field: str
    operator: str  # equals | contains | starts_with | is_in
    value: object


@dataclass(frozen=True)
class Constraint:
    effect: str  # allow | deny
    action: str  # GET/POST/PUT/DELETE
    criteria: tuple[Criterion, ...]


def _criterion_column(c: Criterion) -> Column:
    col = F.col(c.field)
    if c.field == "tags":  # array membership
        if c.operator == "contains":
            return F.array_contains(col, str(c.value))
        raise ValueError(f"unsupported tags operator: {c.operator}")
    if c.operator == "equals":
        return col == F.lit(c.value)
    if c.operator == "contains":
        return col.contains(str(c.value))
    if c.operator == "starts_with":
        return col.startswith(str(c.value))
    if c.operator == "is_in":
        return col.isin(*list(c.value))
    raise ValueError(f"unsupported operator: {c.operator}")


def compile_constraints(
    constraints: list[Constraint], action: str = "GET"
) -> Column:
    """AND within a constraint's criteria; OR across allows; deny wins."""
    allows = [c for c in constraints if c.effect == "allow" and c.action == action]
    denies = [c for c in constraints if c.effect == "deny" and c.action == action]

    def conj(crit: tuple[Criterion, ...]) -> Column:
        pred = F.lit(True)
        for c in crit:
            pred = pred & _criterion_column(c)
        return pred

    allowed = F.lit(False)
    for c in allows:
        allowed = allowed | conj(c.criteria)
    denied = F.lit(False)
    for c in denies:
        denied = denied | conj(c.criteria)
    return allowed & ~denied
