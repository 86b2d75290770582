"""The ``metadataQuery`` mini-language → Column compiler.

Grammar (reference: search.py:1123-1233):
    query     := pair ( (" AND " | " OR ") pair )*
    pair      := key ":" value
    value     := '"' exact '"' | wildcardable
Only ONE operator kind may appear in a query (all-AND or all-OR —
search.py:1190-1200). A quoted value is an exact term match; an
unquoted value matches with implicit substring/wildcard semantics.

Search modes (search.py:1235-1303):
    key   — the metadata *key* must exist (any value)
    value — any metadata value matches the pattern
    both  — key:value pairs as above

The engine stores metadata as ``map<string,string>`` (SURVEY §1.3), so
pairs compile to ``element_at(metadata, key)`` predicates and
value-mode compiles to an ``exists()`` higher-order function over
``map_values`` — all JVM-side expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.scoring import wildcard_to_like

_PAIR_RE = re.compile(r'\s*([^:\s]+)\s*:\s*("([^"]*)"|\S+)\s*')


class MetadataQueryError(ValueError):
    pass


def _parse(query: str) -> tuple[str, list[tuple[str, str, bool]]]:
    """Return (operator, [(key, value, exact)…])."""
    has_and = " AND " in query
    has_or = " OR " in query
    if has_and and has_or:
        raise MetadataQueryError(
            "metadataQuery supports a single operator kind per query"
        )
    op = "OR" if has_or else "AND"
    parts = query.split(f" {op} ") if (has_and or has_or) else [query]
    pairs: list[tuple[str, str, bool]] = []
    for part in parts:
        m = _PAIR_RE.fullmatch(part)
        if not m:
            raise MetadataQueryError(f"malformed metadata pair: {part!r}")
        key, raw, quoted = m.group(1), m.group(2), m.group(3)
        exact = quoted is not None
        pairs.append((key, quoted if exact else raw, exact))
    return op, pairs


def _value_predicate(value_col: Column, value: str, exact: bool) -> Column:
    if exact:
        return value_col == F.lit(value)
    v = value.lower()
    if "*" in v or "?" in v:
        return F.lower(value_col).like(wildcard_to_like(v))
    return F.lower(value_col).contains(v)


def compile_metadata_query(
    query: str,
    metadata_col: str = "metadata",
    mode: str = "both",
) -> Column:
    """Compile a metadataQuery string into a boolean Column over a
    ``map<string,string>`` metadata column."""
    mcol = F.col(metadata_col)
    if mode == "key":
        # every pair key must exist, values ignored (search.py:1256-1261)
        op, pairs = _parse(query)
        preds = [F.element_at(mcol, k).isNotNull() for k, _, _ in pairs]
    elif mode == "value":
        # any metadata value matches any pattern (search.py:1272-1303);
        # factory closure keeps the HOF lambda single-parameter
        def value_pred(val: str, exact: bool):
            return lambda v: _value_predicate(v, val, exact)

        op, pairs = _parse(query)
        preds = [
            F.exists(F.map_values(mcol), value_pred(v_, e_))
            for _, v_, e_ in pairs
        ]
    elif mode == "both":
        op, pairs = _parse(query)
        preds = [
            _value_predicate(F.element_at(mcol, k), v, e) for k, v, e in pairs
        ]
    else:
        raise MetadataQueryError(f"unknown metadata search mode: {mode!r}")

    combined = preds[0]
    for p in preds[1:]:
        combined = (combined | p) if op == "OR" else (combined & p)
    return combined
