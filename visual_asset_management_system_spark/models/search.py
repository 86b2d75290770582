"""Search request models.

Mirrors the validated request surface of the reference
(models/search.py:126-206 and the SimpleSearchQueryBuilder named params,
search.py:497-900) as plain dataclasses: the HTTP/Pydantic layer is an
API concern; the engine only needs the typed request.

Validation constants come from the reference's hard limits
(models/search.py:128-129, 144-145): from+size ≤ 10,000; size ≤ 2,000.
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_RESULT_WINDOW = 10_000
MAX_PAGE_SIZE = 2_000

#: operators supported by structured filters (SURVEY §2.2)
FILTER_OPERATORS = (
    "eq",        # exact term match (term on .keyword)
    "neq",       # negated term
    "contains",  # substring containment (implicit *q*)
    "wildcard",  # user wildcards * ?
    "prefix",    # starts-with
    "exists",    # field present / metadata key present
    "in",        # IN-list (accessible databases etc.)
    "gte",
    "lte",
    "gt",
    "lt",
)


@dataclass(frozen=True)
class SearchFilter:
    field: str
    operator: str = "eq"
    value: object = None
    negate: bool = False

    def __post_init__(self) -> None:
        if self.operator not in FILTER_OPERATORS:
            raise ValueError(f"unknown filter operator: {self.operator!r}")


@dataclass(frozen=True)
class SortSpec:
    field: str
    descending: bool = False


@dataclass
class SearchRequest:
    """One search call (POST /search equivalent).

    ``query``          free-text over the entity's text fields
    ``filters``        AND-ed structured predicates (filter context —
                       non-scoring, search.py:848-867)
    ``should``         OR-ed predicates, minimum_should_match=1
    ``metadata_query`` the ``k:v AND/OR k:v`` mini-language
                       (search.py:1123-1233)
    ``entity_types``   subset of {"asset", "file"} — dual-index routing
    ``databases``      accessible-database restriction (auth semi-join)
    ``include_archived`` archived rows are excluded by default
                       (must_not bool_archived, search.py:649-651)
    """

    query: str | None = None
    #: relevance tier for ``query``: "match_count" (v0 weighted
    #: field-match count) or "bm25" (inverted-index BM25, OR semantics
    #: over query terms) — both expose the same ``score double`` column
    relevance: str = "match_count"
    filters: list[SearchFilter] = field(default_factory=list)
    should: list[SearchFilter] = field(default_factory=list)
    metadata_query: str | None = None
    metadata_search_mode: str = "both"  # key | value | both
    entity_types: tuple[str, ...] = ("asset", "file")
    databases: list[str] | None = None
    include_archived: bool = False
    sort: list[SortSpec] = field(default_factory=list)
    offset: int = 0
    size: int = 100
    facets: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if not 0 <= self.offset <= MAX_RESULT_WINDOW:
            raise ValueError("offset out of range [0, 10000]")
        if not 1 <= self.size <= MAX_PAGE_SIZE:
            raise ValueError("size out of range [1, 2000]")
        if self.offset + self.size > MAX_RESULT_WINDOW:
            raise ValueError("offset+size exceeds result window (10000)")
        bad = set(self.entity_types) - {"asset", "file"}
        if bad:
            raise ValueError(f"unknown entity types: {bad}")
        if self.relevance not in ("match_count", "bm25"):
            raise ValueError(f"unknown relevance tier: {self.relevance!r}")
