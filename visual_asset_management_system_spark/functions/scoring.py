"""Text-match scoring and wildcard translation.

The reference delegates relevance to OpenSearch BM25 over wildcard
query_strings (search.py:1089-1121), whose scores are not reproducible
bit-for-bit. Per SURVEY.md §7 "Hard parts", the engine defines its own
*documented, deterministic* score: a weighted match-count over the
searched columns. Ranking-sensitive tests compare matched-id sets, not
score values; the score itself is still exposed as a real column and is
SQL-expressible so the oracle can reproduce it exactly.

v0 scoring: score = Σ over searched fields of
    weight(field) × [ lower(field) matches the query pattern ]
(case-insensitive substring containment, wildcard-aware).
A BM25 upgrade over a tokenized inverted-index table slots in behind
the same column contract (`score double`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def wildcard_to_like(pattern: str) -> str:
    """Translate user wildcards (``*``/``?`` — search.py:551-564) into
    SQL LIKE syntax, escaping pre-existing LIKE metacharacters."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def field_matches(col: Column, query: str) -> Column:
    """Case-insensitive match of one column against a user query.

    No explicit wildcard → implicit substring containment (the
    reference wraps general queries as ``*q*``, search.py:665-696).
    """
    lowered = F.lower(col)
    q = query.lower()
    if "*" in q or "?" in q:
        return lowered.like(wildcard_to_like(q))
    return lowered.contains(q)


def text_match_score(
    query: str, fields: dict[str, float]
) -> Column:
    """Deterministic relevance score: weighted count of matching fields.

    ``fields`` maps column name → weight (e.g. asset_name boosted over
    description, mirroring the reference's implicit field list
    search.py:456-467).
    """
    score = F.lit(0.0)
    for name, weight in fields.items():
        score = score + F.when(
            field_matches(F.col(name), query), F.lit(float(weight))
        ).otherwise(F.lit(0.0))
    return score
