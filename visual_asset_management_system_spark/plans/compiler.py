"""Search request → DataFrame compiler (the primary read path).

Re-expresses the reference's DualIndexQueryBuilder + response processing
pipeline (search.py:949-1776) as ONE declarative Spark plan:

    request
      → per-entity predicate tree (filter context — non-scoring AND)
      → optional text score column (deterministic match-count)
      → authorization filter  *before* the limit
      → dual-entity unionByName (asset ∪ file hits, `_rectype` tag)
      → global sort → offset/limit

Key semantic cleanups over the reference, per SURVEY.md §4:
- the ×2 over-fetch buffer + in-memory re-pagination (search.py:967-996,
  1739-1748) disappears: the auth filter is part of the plan, so
  Catalyst filters before the limit;
- the disabled post-merge re-sort (search.py:283-291) becomes a real
  global orderBy after the union — strictly more correct.

At scale: filters compile to pushable predicates (Parquet row-group
skipping), the union is a no-shuffle concatenation, and sort+limit is
a TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scoring import field_matches, text_match_score, wildcard_to_like
from ..models.search import SearchFilter, SearchRequest
from .metadata_query import compile_metadata_query

#: text fields searched per entity type, with boost weights — the Spark
#: analog of the reference's field lists (search.py:456-467, 888-900).
DEFAULT_TEXT_FIELDS: dict[str, dict[str, float]] = {
    "asset": {"asset_name": 2.0, "description": 1.0, "asset_type": 1.0},
    "file": {"file_key": 2.0, "file_ext": 1.0},
}

MIN_SCORE = 0.01  # min_score pruning for text queries (search.py:993-995)


def _filter_to_column(flt: SearchFilter) -> Column:
    col = F.col(flt.field)
    op = flt.operator
    if op == "eq":
        pred = col == F.lit(flt.value)
    elif op == "neq":
        pred = col != F.lit(flt.value)
    elif op == "contains":
        pred = F.lower(col).contains(str(flt.value).lower())
    elif op == "wildcard":
        pred = F.lower(col).like(wildcard_to_like(str(flt.value).lower()))
    elif op == "prefix":
        pred = col.startswith(str(flt.value))
    elif op == "exists":
        pred = col.isNotNull()
    elif op == "in":
        pred = col.isin(*list(flt.value))
    elif op == "gte":
        pred = col >= F.lit(flt.value)
    elif op == "lte":
        pred = col <= F.lit(flt.value)
    elif op == "gt":
        pred = col > F.lit(flt.value)
    elif op == "lt":
        pred = col < F.lit(flt.value)
    else:  # pragma: no cover — guarded by SearchFilter.__post_init__
        raise ValueError(op)
    return ~pred if flt.negate else pred


def index_mappings(search_tables: dict[str, DataFrame]) -> DataFrame:
    """Schema introspection — the ``GET /search`` mappings response
    (search.py:1782-1800 returns each index's field→type mapping). One
    row per (entity_type, field, dtype), derived from the live plan
    schemas, so it can never drift from what queries actually see.
    Driver-side metadata only — no job runs."""
    first = next(iter(search_tables.values()))
    spark = first.sparkSession
    rows = [
        (entity, f.name, f.dataType.simpleString())
        for entity, df in sorted(search_tables.items())
        for f in df.schema.fields
    ]
    return spark.createDataFrame(
        rows, "entity_type string, field string, dtype string"
    )


class SearchCompiler:
    """Compile SearchRequests over the denormalized search tables.

    ``search_tables`` maps entity type ("asset"/"file") to its search
    DataFrame (built by operators.search_tables — the engine's analog of
    the reference's OpenSearch indexes).  ``auth_predicate`` is an
    optional Column applied per entity *inside* the plan (row-level ABAC,
    search.py:1711-1737 made pre-limit).
    """

    #: entity key columns — the join identity between a search table and
    #: its inverted-index postings
    ENTITY_KEYS: dict[str, list[str]] = {
        "asset": ["database_id", "asset_id"],
        "file": ["database_id", "asset_id", "file_key"],
    }

    def __init__(
        self,
        search_tables: dict[str, DataFrame],
        text_fields: dict[str, dict[str, float]] | None = None,
        auth_predicate: Column | None = None,
        inverted_indexes: dict[str, tuple[DataFrame, DataFrame]] | None = None,
    ) -> None:
        self.search_tables = search_tables
        self.text_fields = text_fields or DEFAULT_TEXT_FIELDS
        self.auth_predicate = auth_predicate
        #: entity → (postings, stats) built by
        #: operators.inverted_index.build_inverted_index — maintained
        #: state like the search tables themselves; required for
        #: relevance="bm25" requests on that entity
        self.inverted_indexes = inverted_indexes or {}

    # -- single-entity plan ------------------------------------------------
    def _entity_plan(self, entity: str, req: SearchRequest) -> DataFrame:
        df = self.search_tables[entity]
        cols = set(df.columns)

        if not req.include_archived and "is_archived" in cols:
            # must_not bool_archived (search.py:649-651)
            df = df.filter(~F.coalesce(F.col("is_archived"), F.lit(False)))

        if req.databases is not None and "database_id" in cols:
            df = df.filter(F.col("database_id").isin(req.databases))

        for flt in req.filters:
            if flt.field in cols:
                df = df.filter(_filter_to_column(flt))
            else:
                # filter on a field this entity doesn't have → no hits,
                # matching OpenSearch missing-field semantics
                df = df.filter(F.lit(False))

        if req.should:
            applicable = [f for f in req.should if f.field in cols]
            if applicable:
                pred = _filter_to_column(applicable[0])
                for f2 in applicable[1:]:
                    pred = pred | _filter_to_column(f2)
                df = df.filter(pred)
            else:
                df = df.filter(F.lit(False))

        if req.metadata_query and "metadata" in cols:
            pred = compile_metadata_query(
                req.metadata_query, "metadata", req.metadata_search_mode
            )
            # file docs also carry the AB_ pipeline-attribute flat object;
            # value-mode searches span MD_._value AND AB_._value
            # (search.py:787-811: fields = ["MD_._value", "AB_._value"]
            # if index_type == "file")
            if req.metadata_search_mode == "value" and "attributes" in cols:
                pred = pred | compile_metadata_query(
                    req.metadata_query, "attributes", "value"
                )
            df = df.filter(pred)
        elif req.metadata_query:
            df = df.filter(F.lit(False))

        # quoted "..." spans in the query are PHRASES: exact token
        # adjacency required in at least one searched text field (the
        # reference's query_string quoting — search.py:1089-1121).
        # Phrases act as filter context BEFORE scoring; scoring then
        # sees the quote-stripped term stream, so a phrase's terms
        # still contribute to relevance like OpenSearch's
        score_query, phrases = self._query_parts(req.query)
        if phrases:
            from ..operators.inverted_index import phrase_expr

            for phrase in phrases:
                pred = F.lit(False)
                for fld in self.text_fields[entity]:
                    if fld in cols:
                        pred = pred | phrase_expr(F.col(fld), phrase)
                df = df.filter(pred)

        if req.query and req.relevance == "bm25":
            if entity not in self.inverted_indexes:
                raise ValueError(
                    f"relevance='bm25' requires an inverted index for "
                    f"entity {entity!r} (pass inverted_indexes=...)"
                )
            from ..operators.inverted_index import bm25_scores

            postings, stats = self.inverted_indexes[entity]
            keys = self.ENTITY_KEYS[entity]
            scores = bm25_scores(postings, stats, score_query, keys)
            # inner join = BM25's natural min-score: a doc with no query
            # term scores 0 and is not a hit (MIN_SCORE is the
            # match-count tier's pruning knob; BM25+ idf is always > 0
            # for any matching doc, so no extra threshold applies)
            df = df.join(scores, keys)
        elif req.query:
            from ..operators.inverted_index import phrase_expr

            fields = {
                k: w for k, w in self.text_fields[entity].items() if k in cols
            }
            score = text_match_score(score_query, fields)
            # a matched phrase scores like a matched term (per-field
            # weights), so adjacency-only hits (e.g. punctuation-
            # separated tokens the substring tier misses) survive the
            # MIN_SCORE prune — OpenSearch's quoted spans score too
            for phrase in phrases:
                for fld, w in fields.items():
                    score = score + F.when(
                        phrase_expr(F.col(fld), phrase), F.lit(float(w))
                    ).otherwise(F.lit(0.0))
            df = df.withColumn("score", score)
            df = df.filter(F.col("score") > MIN_SCORE)
        else:
            df = df.withColumn("score", F.lit(0.0))

        if self.auth_predicate is not None:
            df = df.filter(self.auth_predicate)

        return df.withColumn("rectype", F.lit(entity))

    # -- public surface ----------------------------------------------------
    def hits(self, req: SearchRequest) -> DataFrame:
        """The merged, sorted, paginated hit DataFrame."""
        plans = [self._entity_plan(e, req) for e in req.entity_types]
        df = plans[0]
        for p in plans[1:]:
            df = df.unionByName(p, allowMissingColumns=True)

        order: list[Column] = []
        for s in req.sort:
            c = F.col(s.field)
            order.append(c.desc() if s.descending else c.asc())
        if not order:
            order = [F.col("score").desc()]
        # deterministic global order: entity id is the final tiebreak
        for tiebreak in ("database_id", "asset_id", "file_key"):
            if all(tiebreak in p.columns for p in plans):
                order.append(F.col(tiebreak).asc())

        df = df.orderBy(*order)
        if req.offset:
            df = df.offset(req.offset)
        return df.limit(req.size)

    def total(self, req: SearchRequest) -> int:
        """track_total_hits equivalent: exact count across entities."""
        plans = [self._entity_plan(e, req) for e in req.entity_types]
        return sum(p.count() for p in plans)

    def totals_df(self, req: SearchRequest) -> DataFrame:
        """track_total_hits as a relation: exact pre-limit hit count per
        entity (search.py:1589-1603 reports per-index totals) — the
        distributed form of :meth:`total`, one aggregation per entity
        plan, no collect."""
        # global aggregation (not groupBy) so an entity with zero hits
        # still reports a 0 row, like the per-index total in the response
        outs = [
            self._entity_plan(e, req)
            .agg(F.count(F.lit(1)).alias("total_hits"))
            .select(F.lit(e).alias("rectype"), "total_hits")
            for e in req.entity_types
        ]
        if not outs:  # no entities requested → empty relation, not a crash
            spark = next(iter(self.search_tables.values())).sparkSession
            return spark.createDataFrame(
                [], "rectype string, total_hits bigint"
            )
        df = outs[0]
        for o in outs[1:]:
            df = df.unionByName(o)
        return df

    def facets(self, req: SearchRequest, max_buckets: int = 1000) -> DataFrame:
        """Terms aggregations: (rectype, field, value, doc_count).

        Computed under the full predicate set minus pagination, matching
        the reference's filtered aggregation (search.py:1392-1486;
        bucket cap 1000).  Array-typed facet fields (tags) must be
        exploded by the caller into scalar columns beforehand — the
        search-table builder materializes ``tags`` as an array and this
        method explodes it here.
        """
        outs: list[DataFrame] = []
        for entity in req.entity_types:
            plan = self._entity_plan(entity, req)
            for fld in req.facets:
                if fld == "tags" and "tags" in plan.columns:
                    src = plan.select(
                        F.explode("tags").alias("facet_value")
                    )
                elif fld.startswith("metadata.") and "metadata" in plan.columns:
                    # terms aggregation on a MD_ pseudo-field
                    # (search.py:1392-1486 aggregates flat-object fields):
                    # map lookup, absent-key rows contribute no bucket
                    key = fld.split(".", 1)[1]
                    src = plan.select(
                        F.element_at("metadata", key).alias("facet_value")
                    ).filter(F.col("facet_value").isNotNull())
                elif fld in plan.columns:
                    src = plan.select(F.col(fld).cast("string").alias("facet_value"))
                else:
                    continue
                outs.append(
                    src.groupBy("facet_value")
                    .agg(F.count(F.lit(1)).alias("doc_count"))
                    .withColumn("rectype", F.lit(entity))
                    .withColumn("facet_field", F.lit(fld))
                )
        if not outs:
            raise ValueError("no applicable facet fields")
        df = outs[0]
        for o in outs[1:]:
            df = df.unionByName(o)
        # cross-index bucket merge (search.py:258-277) = one more groupBy
        return (
            df.groupBy("facet_field", "facet_value")
            .agg(F.sum("doc_count").alias("doc_count"))
            .orderBy(F.col("doc_count").desc(), F.col("facet_value").asc())
            .limit(max_buckets)
        )

    @staticmethod
    def _query_parts(query: str | None) -> tuple[str | None, list[list[str]]]:
        """Normalize a request query once for every consumer: quoted
        spans become phrase token sequences, and the scoring/highlight
        tiers see the quote-stripped, whitespace-normalized term stream
        — so hits(), explain() and highlight() can never disagree about
        what a quoted query means."""
        if not query:
            return query, []
        from ..operators.inverted_index import extract_phrases

        _, phrases = extract_phrases(query)
        if not phrases:
            return query, []
        return " ".join(query.replace('"', " ").split()), phrases

    def _field_match_pred(
        self, fld: str, score_query: str, phrases: list[list[str]]
    ) -> Column:
        """Did this field match the query? — substring containment of
        the loose terms OR token adjacency of any quoted phrase; the
        SAME predicate scoring uses, so explanation/highlight agree
        with the hit set."""
        pred = field_matches(F.col(fld), score_query)
        if phrases:
            from ..operators.inverted_index import phrase_expr

            for p in phrases:
                pred = pred | phrase_expr(F.col(fld), p)
        return pred

    def explain(self, df: DataFrame, req: SearchRequest) -> DataFrame:
        """Append an ``explanation`` struct column to a hits DataFrame —
        the per-hit match explanation of search.py:1569-1621
        (_add_search_explanation): which text fields matched, the query
        type, the hit's index/entity type, and a score breakdown. Pure
        Column expressions over the already-computed hit rows — no extra
        scan or shuffle; the field-match predicates are the same ones
        highlight() uses, so explanation and highlights can never
        disagree."""
        if req.query and req.metadata_query:
            query_type = "combined"
        elif req.query:
            query_type = "general"
        elif req.metadata_query:
            query_type = "metadata"
        else:
            query_type = "none"

        field_order: list[str] = []
        for entity in req.entity_types:
            for fld in self.text_fields[entity]:
                if fld in df.columns and fld not in field_order:
                    field_order.append(fld)
        if req.query:
            score_query, phrases = self._query_parts(req.query)
            matched = F.array_compact(
                F.array(
                    *[
                        F.when(
                            self._field_match_pred(f, score_query, phrases),
                            F.lit(f),
                        )
                        for f in field_order
                    ]
                )
            )
        else:
            matched = F.array().cast("array<string>")
        return df.withColumn(
            "explanation",
            F.struct(
                F.lit(query_type).alias("query_type"),
                F.col("rectype").alias("index_type"),
                matched.alias("matched_fields"),
                F.size(matched).alias("field_matches"),
                F.col("score").alias("total_score"),
            ),
        )

    def highlight(
        self, df: DataFrame, req: SearchRequest, pre: str = "<em>", post: str = "</em>"
    ) -> DataFrame:
        """Append ``highlight_<field>`` columns wrapping query matches
        (search.py:869-886) — regexp_replace on matching columns."""
        if not req.query:
            return df
        import re as _re

        score_query, phrases = self._query_parts(req.query)
        # wrap the loose term stream; a phrase-only hit whose surface
        # form differs from the raw span (punctuation-separated tokens)
        # gets a non-null highlight column with the field text unwrapped
        # — matched-but-not-wrappable, mirroring explain()'s predicate
        q = _re.escape(score_query.lower())
        for entity in req.entity_types:
            for fld in self.text_fields[entity]:
                if fld in df.columns:
                    df = df.withColumn(
                        f"highlight_{fld}",
                        F.when(
                            self._field_match_pred(fld, score_query, phrases),
                            F.regexp_replace(
                                F.col(fld), f"(?i)({q})", f"{pre}$1{post}"
                            ),
                        ),
                    )
        return df
