"""Unit tests for the search request compiler — the request→plan style
the reference tests with query-builder units (SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from visual_asset_management_system_spark.models.search import (
    SearchFilter,
    SearchRequest,
    SortSpec,
)
from visual_asset_management_system_spark.plans.compiler import SearchCompiler
from visual_asset_management_system_spark.plans.metadata_query import (
    MetadataQueryError,
    compile_metadata_query,
)
from visual_asset_management_system_spark.queries import tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def compiler(spark):
    t = tables(spark, SF)
    return SearchCompiler(
        {"asset": t["search_assets"], "file": t["search_files"]}
    )


def test_request_validation():
    with pytest.raises(ValueError):
        SearchRequest(size=0)
    with pytest.raises(ValueError):
        SearchRequest(size=2001)
    with pytest.raises(ValueError):
        SearchRequest(offset=9500, size=1000)  # from+size > 10000
    with pytest.raises(ValueError):
        SearchRequest(entity_types=("asset", "nope"))
    with pytest.raises(ValueError):
        SearchFilter("f", "unknown_op", 1)


def test_archived_excluded_by_default(compiler):
    hits = compiler.hits(SearchRequest(entity_types=("asset",), size=2000))
    assert hits.filter(F.col("is_archived")).count() == 0
    with_archived = compiler.hits(
        SearchRequest(entity_types=("asset",), size=2000, include_archived=True)
    )
    assert with_archived.count() > hits.count()


def test_filter_on_missing_field_yields_no_hits(compiler):
    req = SearchRequest(
        entity_types=("asset",),
        filters=[SearchFilter("file_ext", "eq", "glb")],  # file-only field
    )
    assert compiler.hits(req).count() == 0


def test_dual_entity_union_tags_rectype(compiler):
    req = SearchRequest(size=2000)
    recs = {r["rectype"] for r in compiler.hits(req).select("rectype").distinct().collect()}
    assert recs == {"asset", "file"}


def test_wildcard_and_prefix_filters(compiler):
    req = SearchRequest(
        entity_types=("file",),
        filters=[SearchFilter("file_key", "wildcard", "/f/1*_?.glb")],
        size=2000,
    )
    rows = compiler.hits(req).select("file_key").collect()
    assert rows, "wildcard should match something"
    for r in rows:
        assert r["file_key"].startswith("/f/1") and r["file_key"].endswith(".glb")


def test_should_is_or_semantics(compiler):
    req = SearchRequest(
        entity_types=("asset",),
        should=[
            SearchFilter("asset_type", "eq", "glb"),
            SearchFilter("asset_type", "eq", "ifc"),
        ],
        size=2000,
    )
    types = {
        r["asset_type"]
        for r in compiler.hits(req).select("asset_type").distinct().collect()
    }
    assert types == {"glb", "ifc"}


def test_text_score_ranks_name_matches_higher(compiler):
    req = SearchRequest(query="red", entity_types=("asset",), size=2000)
    rows = compiler.hits(req).select("asset_name", "description", "score").collect()
    assert rows
    for r in rows:
        expected = 0.0
        if "red" in r["asset_name"].lower():
            expected += 2.0
        if "red" in r["description"].lower():
            expected += 1.0
        assert r["score"] == expected


def test_total_and_pagination_consistency(compiler):
    req = SearchRequest(entity_types=("asset",), size=10)
    total = compiler.total(req)
    page1 = compiler.hits(req).collect()
    page2 = compiler.hits(
        SearchRequest(entity_types=("asset",), size=10, offset=10)
    ).collect()
    assert len(page1) == 10 and len(page2) == 10
    ids1 = {r["asset_id"] for r in page1}
    ids2 = {r["asset_id"] for r in page2}
    assert not ids1 & ids2
    assert total > 20


def test_sort_spec_ordering(compiler):
    req = SearchRequest(
        entity_types=("file",),
        sort=[SortSpec("file_size", descending=True)],
        size=50,
    )
    sizes = [r["file_size"] for r in compiler.hits(req).collect()]
    assert sizes == sorted(sizes, reverse=True)


def test_highlight_wraps_matches(compiler):
    req = SearchRequest(query="red", entity_types=("asset",), size=20)
    df = compiler.highlight(compiler.hits(req), req)
    row = df.filter(F.col("highlight_asset_name").isNotNull()).first()
    assert row is not None and "<em>red</em>" in row["highlight_asset_name"]


def test_metadata_query_single_operator_rule():
    with pytest.raises(MetadataQueryError):
        compile_metadata_query("a:1 AND b:2 OR c:3")
    with pytest.raises(MetadataQueryError):
        compile_metadata_query("not-a-pair-without-colon ")
    compile_metadata_query('k:"exact value"')  # quoted exact parses


# -- BM25 relevance tier ----------------------------------------------------

def test_bm25_known_values(spark):
    """Hand-computed BM25 on a 3-doc corpus, single unit-weight field:
    the engine's scores must equal the textbook formula to 1e-9 and be
    identical across runs (deterministic)."""
    import math

    from visual_asset_management_system_spark.operators.inverted_index import (
        bm25_scores,
        build_inverted_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "red fox jumps"),
            (2, "red red wine"),
            (3, "blue sky"),
        ],
        "id long, body string",
    )
    postings, stats = build_inverted_index(docs, ["id"], {"body": 1.0})
    got = {
        r["id"]: r["score"]
        for r in bm25_scores(postings, stats, "red", ["id"]).collect()
    }

    k1, b, n, avgdl, df = 1.2, 0.75, 3, (3 + 3 + 2) / 3, 2
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def expected(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert set(got) == {1, 2}  # doc 3 has no query term → not a hit
    assert got[1] == pytest.approx(expected(1, 3), abs=1e-9)
    assert got[2] == pytest.approx(expected(2, 3), abs=1e-9)
    # term frequency matters: "red red wine" outranks "red fox jumps"
    assert got[2] > got[1]
    rerun = {
        r["id"]: r["score"]
        for r in bm25_scores(postings, stats, "red", ["id"]).collect()
    }
    assert rerun == got


def test_bm25_idf_ranks_rare_term_higher(spark):
    """A doc matching the RARE query term must outscore a doc matching
    the ubiquitous one — the property the match-count tier lacks."""
    from visual_asset_management_system_spark.operators.inverted_index import (
        bm25_scores,
        build_inverted_index,
    )

    rows = [(i, "common filler") for i in range(1, 20)]
    rows += [(100, "zyzzyva specimen")]  # rare term, same doc length
    docs = spark.createDataFrame(rows, "id long, body string")
    postings, stats = build_inverted_index(docs, ["id"], {"body": 1.0})
    got = {
        r["id"]: r["score"]
        for r in bm25_scores(
            postings, stats, "common zyzzyva", ["id"]
        ).collect()
    }
    assert got[100] > max(v for k, v in got.items() if k != 100)


def test_bm25_compiler_tier(spark):
    """relevance='bm25' flows through the compiler behind the same
    score contract: token (not substring) hit semantics, score column
    present, and a missing index fails loudly."""
    from visual_asset_management_system_spark.operators.inverted_index import (
        build_inverted_index,
    )
    from visual_asset_management_system_spark.plans.compiler import (
        DEFAULT_TEXT_FIELDS,
    )

    t = tables(spark, SF)
    postings, stats = build_inverted_index(
        t["search_assets"], ["database_id", "asset_id"],
        DEFAULT_TEXT_FIELDS["asset"],
    )
    sc = SearchCompiler(
        {"asset": t["search_assets"]},
        inverted_indexes={"asset": (postings, stats)},
    )
    req = SearchRequest(
        query="red", relevance="bm25", entity_types=("asset",), size=2000
    )
    hits = sc.hits(req)
    assert "score" in hits.columns
    rows = hits.collect()
    assert rows
    # token semantics: every hit has 'red' as a standalone token in a
    # searched field — 'goldenrod' alone must NOT hit
    for r in rows:
        text = " ".join(
            str(r[f] or "") for f in ("asset_name", "description", "asset_type")
        ).lower()
        assert "red" in text.replace("-", " ").split()

    with pytest.raises(ValueError, match="bm25"):
        SearchCompiler({"asset": t["search_assets"]}).hits(req).collect()
    with pytest.raises(ValueError, match="relevance"):
        SearchRequest(query="x", relevance="tfidf")


def test_bm25_stoplist_drops_ubiquitous_terms_only(spark):
    """max_df_ratio removes terms above the doc-frequency cap from the
    postings while leaving rare-term scores bit-identical (dl and
    corpus stats computed before the drop)."""
    from visual_asset_management_system_spark.operators.inverted_index import (
        bm25_scores,
        build_inverted_index,
    )

    docs = spark.createDataFrame(
        [(i, f"the common token w{i}") for i in range(10)],
        "id long, body string",
    )
    full_p, full_s = build_inverted_index(docs, ["id"], {"body": 1.0})
    cut_p, cut_s = build_inverted_index(
        docs, ["id"], {"body": 1.0}, max_df_ratio=0.5
    )
    cut_terms = {r["term"] for r in cut_p.select("term").distinct().collect()}
    assert "the" not in cut_terms and "common" not in cut_terms
    assert all(f"w{i}" in cut_terms for i in range(10))
    score = lambda p, s, q: {  # noqa: E731
        r["id"]: r["score"] for r in bm25_scores(p, s, q, ["id"]).collect()
    }
    assert score(cut_p, cut_s, "w3") == score(full_p, full_s, "w3")
    assert score(cut_p, cut_s, "the") == {}  # all-stopword query → no hits


def test_bm25_query_and_index_analyzers_agree(spark):
    """The query-side (Python) and index-side (JVM) analyzers must
    produce the same token SET for the same string — hit parity depends
    on it (a doc matches iff the sets intersect). Adversarial corpus:
    unicode case, digits, punctuation runs, empty/degenerate strings."""
    from visual_asset_management_system_spark.operators.inverted_index import (
        tokenize,
        tokenize_query,
    )

    corpus = [
        "Red METALLIC box", "a-b_c.d,e;f", "  leading  runs   ",
        "", "...", "x", "123 abc123 45x", "Ünïcödé Straße İstanbul",
        "tab\tand\nnewline", "mixed: CASE, With? wild*cards!",
        "don't stop-motion", "a" * 300,
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "i int, s string")
    jvm = {
        r["i"]: set(r["toks"])
        for r in df.select("i", tokenize(F.col("s")).alias("toks")).collect()
    }
    for i, s in enumerate(corpus):
        assert jvm[i] == set(tokenize_query(s)), (i, s, jvm[i], tokenize_query(s))


def test_explain_query_type_classification(spark, compiler):
    """query_type mirrors _add_search_explanation: combined / general /
    metadata / none; matched_fields empty without a text query."""
    cases = [
        (SearchRequest(query="red", metadata_query="status:O",
                       entity_types=("asset",)), "combined"),
        (SearchRequest(query="red", entity_types=("asset",)), "general"),
        (SearchRequest(metadata_query="status:O",
                       entity_types=("asset",)), "metadata"),
        (SearchRequest(entity_types=("asset",)), "none"),
    ]
    for req, want in cases:
        row = (
            compiler.explain(compiler.hits(req), req)
            .select("explanation.*")
            .first()
        )
        assert row is not None, want
        assert row["query_type"] == want
        if req.query is None:
            assert row["matched_fields"] == [] and row["field_matches"] == 0
        else:
            assert row["field_matches"] >= 1


def test_phrase_expr_and_extraction(spark):
    """Quoted-phrase parsing and the slice-equality adjacency predicate."""
    from pyspark.sql import functions as F

    from visual_asset_management_system_spark.operators.inverted_index import (
        extract_phrases,
        phrase_expr,
    )

    from visual_asset_management_system_spark.operators.inverted_index import (
        tokenize_query,
    )

    residual, phrases = extract_phrases('alpha "hash join" beta "x" ""')
    assert phrases == [["hash", "join"], ["x"]]
    # an empty '""' span is not a phrase; any quote residue in the
    # residual is stripped by the analyzer downstream
    assert tokenize_query(residual) == ["alpha", "beta"]

    df = spark.createDataFrame(
        [
            (1, "fast hash join plan"),
            (2, "hash of the join"),       # terms present, not adjacent
            (3, "HASH-JOIN strategy"),     # case/punct normalized by analyzer
            (4, None),
            (5, "hash"),
        ],
        "id bigint, s string",
    )
    got = {
        r["id"]
        for r in df.filter(phrase_expr(F.col("s"), ["hash", "join"])).collect()
    }
    assert got == {1, 3}
    single = {
        r["id"] for r in df.filter(phrase_expr(F.col("s"), ["hash"])).collect()
    }
    assert single == {1, 2, 3, 5}


def test_compiler_phrase_filters_before_scoring(spark):
    """A quoted phrase restricts hits to adjacency matches while loose
    terms still match broadly."""
    from visual_asset_management_system_spark.models.search import SearchRequest
    from visual_asset_management_system_spark.plans.compiler import SearchCompiler

    assets = spark.createDataFrame(
        [
            ("db", "a1", "red widget", "d", "t", False),
            ("db", "a2", "red bolt", "d", "t", False),      # no phrase, no substring
            ("db", "a3", "widget red", "d", "t", False),    # reversed: no phrase
            ("db", "a4", "big red widget kit", "d", "t", False),
            # substring 'red widget' crosses token boundaries — the
            # loose (containment) tier hits it, the phrase tier must not
            ("db", "a5", "sacred widgetry", "d", "t", False),
            # punctuation-separated tokens: phrase hits via analyzer
            # normalization, containment misses — and the phrase's own
            # score contribution keeps it above MIN_SCORE
            ("db", "a6", "red-widget combo", "d", "t", False),
        ],
        "database_id string, asset_id string, asset_name string,"
        "description string, asset_type string, is_archived boolean",
    )
    sc = SearchCompiler({"asset": assets})

    loose = {r["asset_id"] for r in sc.hits(SearchRequest(
        query="red widget", entity_types=("asset",), size=10
    )).collect()}
    phrased = {r["asset_id"] for r in sc.hits(SearchRequest(
        query='"red widget"', entity_types=("asset",), size=10
    )).collect()}
    assert loose == {"a1", "a4", "a5"}
    assert phrased == {"a1", "a4", "a6"}


def test_phrase_composes_with_bm25_auth_and_filters(spark):
    """Quoted phrases compose with the BM25 tier, an auth predicate,
    and structured filters in one plan — phrase filter first, BM25
    scoring on the quote-stripped terms, auth before the limit."""
    from pyspark.sql import functions as F

    from visual_asset_management_system_spark.models.search import SearchRequest
    from visual_asset_management_system_spark.operators.inverted_index import (
        build_inverted_index,
    )
    from visual_asset_management_system_spark.plans.compiler import SearchCompiler

    assets = spark.createDataFrame(
        [
            ("db", "a1", "red widget", "large unit", "t", False, "ok"),
            ("db", "a2", "red widget", "spare", "t", False, "deny"),
            ("db", "a3", "widget red", "large unit", "t", False, "ok"),
            ("db", "a4", "red widget", "large unit", "t", True, "ok"),
        ],
        "database_id string, asset_id string, asset_name string,"
        "description string, asset_type string, is_archived boolean,"
        "acl string",
    )
    fields = {"asset_name": 2.0, "description": 1.0, "asset_type": 1.0}
    postings, stats = build_inverted_index(
        assets, ["database_id", "asset_id"], fields
    )
    sc = SearchCompiler(
        {"asset": assets},
        auth_predicate=F.col("acl") == "ok",
        inverted_indexes={"asset": (postings, stats)},
    )
    req = SearchRequest(
        query='"red widget" large',
        entity_types=("asset",),
        relevance="bm25",
        size=10,
    )
    rows = {r["asset_id"]: r["score"] for r in sc.hits(req).collect()}
    # a2 fails auth, a3 fails the phrase, a4 is archived -> only a1
    assert set(rows) == {"a1"}
    assert rows["a1"] > 0.0


def test_phrase_repeated_tokens_keep_order_and_multiplicity(spark):
    """A quoted phrase with repeated words must match only true
    repetitions — the query-side dedupe would collapse '"do do do"'
    into the single term 'do'."""
    from pyspark.sql import functions as F

    from visual_asset_management_system_spark.operators.inverted_index import (
        extract_phrases,
        phrase_expr,
    )

    _, phrases = extract_phrases('"do do do"')
    assert phrases == [["do", "do", "do"]]
    _, phrases2 = extract_phrases('"new york new"')
    assert phrases2 == [["new", "york", "new"]]

    df = spark.createDataFrame(
        [
            (1, "do re mi"),
            (2, "do do re"),
            (3, "so do do do re"),
            (4, "new york city"),
            (5, "new york new deal"),
        ],
        "id bigint, s string",
    )
    triple = {
        r["id"]
        for r in df.filter(phrase_expr(F.col("s"), ["do", "do", "do"])).collect()
    }
    assert triple == {3}
    nyn = {
        r["id"]
        for r in df.filter(
            phrase_expr(F.col("s"), ["new", "york", "new"])
        ).collect()
    }
    assert nyn == {5}


def test_explain_and_highlight_agree_on_phrase_hits(spark):
    """explain()/highlight() must classify quoted-phrase hits with the
    same predicate hits() used — no zero-matched-fields explanations
    and no NULL highlights on real phrase hits."""
    from pyspark.sql import functions as F

    from visual_asset_management_system_spark.models.search import SearchRequest
    from visual_asset_management_system_spark.plans.compiler import SearchCompiler

    assets = spark.createDataFrame(
        [
            ("db", "a1", "red widget", "d", "t", False),
            ("db", "a6", "red-widget combo", "d", "t", False),
        ],
        "database_id string, asset_id string, asset_name string,"
        "description string, asset_type string, is_archived boolean",
    )
    sc = SearchCompiler({"asset": assets})
    req = SearchRequest(query='"red widget"', entity_types=("asset",), size=10)
    hits = sc.hits(req)
    explained = {
        r["asset_id"]: r["explanation"]
        for r in sc.explain(hits, req).collect()
    }
    assert set(explained) == {"a1", "a6"}
    for aid, ex in explained.items():
        assert ex["field_matches"] >= 1, f"{aid}: no matched fields"
        assert "asset_name" in ex["matched_fields"]
    lit = {
        r["asset_id"]: r["highlight_asset_name"]
        for r in sc.highlight(hits, req).collect()
    }
    assert lit["a1"] == "<em>red widget</em>"
    # phrase-normalized hit: matched (non-null) but not wrappable
    assert lit["a6"] == "red-widget combo"
