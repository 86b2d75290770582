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


#: expected schema of a constraints table (the engine's analog of the
#: reference's ConstraintsStorageTable, storageBuilder-nestedStack.ts
#: :1057-1147): one row per constraint, criteria nested as an array of
#: (field, operator, value, values) structs — ``value`` for scalar
#: operators, ``values`` for is_in.
CONSTRAINTS_TABLE_SCHEMA = (
    "constraint_id string, effect string, action string, "
    "criteria array<struct<field:string, operator:string, "
    "value:string, values:array<string>>>"
)


def load_constraints(constraints_df) -> list[Constraint]:
    """Constraint rows → the dataclass policy list.

    Data-driven ABAC: the reference loads the whole
    ConstraintsStorageTable to synthesize its Casbin model text
    (authz/__init__.py:387-559) — policy is DATA, not code. The
    ``collect()`` here is that same bounded policy read (a tenant's
    constraint count is human-authored, never entity-scale); the
    compiled predicate still runs fully distributed inside the plan.
    """
    out: list[Constraint] = []
    for r in constraints_df.collect():
        cid = r["constraint_id"]
        if r["effect"] not in ("allow", "deny"):
            raise ValueError(
                f"constraint {cid!r}: unknown effect {r['effect']!r}"
            )
        crits = []
        for c in r["criteria"] or []:
            op = c["operator"]
            if op not in ("equals", "contains", "starts_with", "is_in"):
                raise ValueError(f"constraint {cid!r}: unknown operator {op!r}")
            if op == "is_in":
                if c["values"] is None:
                    raise ValueError(
                        f"constraint {cid!r}: is_in criterion on "
                        f"{c['field']!r} has NULL values array"
                    )
                val: object = list(c["values"])
            else:
                if c["value"] is None:
                    raise ValueError(
                        f"constraint {cid!r}: {op} criterion on "
                        f"{c['field']!r} has NULL value"
                    )
                val = c["value"]
            crits.append(Criterion(c["field"], op, val))
        out.append(
            Constraint(effect=r["effect"], action=r["action"], criteria=tuple(crits))
        )
    return out


def compile_constraints_df(constraints_df, action: str = "GET") -> Column:
    """compile_constraints over a constraints TABLE — the data-driven
    entry point; the Python-literal path stays for tests/embedding."""
    return compile_constraints(load_constraints(constraints_df), action)
