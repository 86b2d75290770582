"""Text-analysis operators over document corpora.

These are the training-data-pipeline primitives (BASELINE.json north
star) on top of the ``documents`` table: tokenization, token counting,
quality scoring, language-ID, and fingerprinting. Everything is a pure
Column expression (whole-stage-codegen eligible; no Python in the hot
path) and each has an exact ANSI-SQL mirror for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# whitespace tokenizer; a BPE-ish token estimate adds punctuation splits
_TOKEN_SPLIT = r"\s+"
_BPE_SPLIT = r"[\s\.,;:!\?\(\)\[\]\{\}\"']+"


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties removed."""
    return F.filter(F.split(F.trim(text), _TOKEN_SPLIT), lambda t: t != "")


def _let(value: Column, body) -> Column:
    """Bind ``value`` once per row and evaluate ``body`` on the bound
    lambda variable — the single-element ``transform`` let-idiom.

    Interpreted HOF expressions get NO cross-reference subexpression
    elimination (two references to the same Python ``Column`` inline
    the subtree twice, and the distinct lambda-variable ids defeat
    CSE), so any non-cheap array/struct consumed more than once inside
    ONE Column expression must be bound explicitly. The executed plan
    for the pre-r14 ``lang_id`` showed its marker-hits filter — and
    the full-text split under it — EIGHT times per row (4 per-language
    entries x 2 references to the argmax struct); the let form
    evaluates each bound value once (probe6: lang_id 0.83x standalone,
    the staged lang+quality stack 0.6x)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_estimate(text: Column) -> Column:
    """BPE-ish token-count estimate: punctuation-aware word count plus a
    length/4 correction for long words (the classic chars/4 heuristic).

    ONE aggregate fold computes count + correction together (the
    separate size(words) + aggregate(words) form inlined the
    punctuation split twice per row — see :func:`_let`); explicit
    floor() because Spark truncates double→int casts while other
    engines round, so the rounding step must be spelled out."""
    words = F.filter(F.split(F.trim(text), _BPE_SPLIT), lambda t: t != "")
    return F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.lit(1).cast("bigint")
        + F.when(
            F.length(w) > 4, F.floor(F.length(w) / 4).cast("bigint") - 1
        ).otherwise(F.lit(0).cast("bigint")),
    ).alias("bpe_tokens")


# stopword list used by the quality score (language-agnostic core English
# function words — the fixture corpus is synthetic English-ish text)
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "by", "at", "from",
)


def quality_score(text: Column, ltoks: Column | None = None) -> Column:
    """Deterministic document-quality score in [0, 1].

    Combines the standard cheap heuristics (length band, alphabetic
    ratio, stopword presence, mean word length band) used by
    web-scale corpus filters. Weights documented here are the spec.

    Internals (value-identical to the spec, oracle-checked): the token
    array is the LOWERED-text tokenization — lowercasing never creates
    or destroys whitespace, so token boundaries (hence the count and
    the mean-word-length denominator) match raw-text tokens exactly,
    and the stopword filter drops its per-token lower(). The
    alphabetic count is regexp_count (no stripped-string allocation).
    ``ltoks`` lets a caller computing several text features pass ONE
    shared lowered-token column (see q_pipeline_preprocess's staged
    stack) — sharing must be an explicit column because two
    separately-built filter() trees carry distinct lambda variables,
    which defeats cross-expression subexpression elimination.
    """
    if ltoks is not None:
        # a column reference is cheap to re-reference — no let needed
        return _quality_from_ltoks(text, ltoks)
    return _let(tokens(F.lower(text)), lambda toks: _quality_from_ltoks(text, toks))


def _quality_from_ltoks(text: Column, toks: Column) -> Column:
    """:func:`quality_score` body given an already-bound lowered-token
    value (a column reference or a let-bound lambda variable — anything
    cheap to re-reference)."""
    n = F.length(text)
    n_tok = F.size(toks)
    alpha_ratio = (
        F.regexp_count(text, F.lit(r"[A-Za-z]")) / F.greatest(n, F.lit(1))
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    mean_word_len = n / F.greatest(n_tok, F.lit(1))
    length_ok = F.when((n >= 50) & (n <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 12), 1.0
    ).otherwise(0.0)
    score = (
        0.25 * length_ok
        + 0.25 * alpha_ratio
        + 0.25 * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        + 0.25 * word_len_ok
    )
    return F.round(score, 4)


#: language marker words — a tiny deterministic n-gram/stopword detector.
#: Accuracy on real text is secondary; the contract is determinism and a
#: documented rule (the fixture corpus is synthetic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
}


def _marker_filter(markers: tuple[str, ...]):
    # factory closure: HOF lambdas must be single-parameter — a second
    # parameter (even defaulted) is bound to the array *index* by Spark
    def pred(t: Column) -> Column:
        return t.isin(*markers)

    return pred


def lang_id(text: Column, ltoks: Column | None = None) -> Column:
    """Marker-word language ID: the language with the most marker hits,
    ties broken by language code order, 'und' when no marker hits.

    Shape matters: higher-order array lambdas are interpreted (no
    whole-stage codegen), so the token array is narrowed ONCE to
    marker hits before the per-language counts, and the argmax is an
    ``array_max`` over (count, -rank) structs — a cascaded
    ``when(c > best_count)`` chain would nest each count subtree
    inside the next comparison and re-evaluate the array filters up to
    2^k times per row (measured 1.9x slower at sf0.1).

    ``ltoks``: optional shared LOWERED-token column (same contract as
    :func:`quality_score` — pass both functions the same column and
    the full-text split regex runs once per row instead of twice)."""
    src = ltoks if ltoks is not None else tokens(F.lower(text))
    return _lang_from_ltoks(src)


def _lang_from_ltoks(src: Column) -> Column:
    """:func:`lang_id` body given the lowered-token array expression
    (evaluated exactly once — it feeds a let binding immediately)."""
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    langs = sorted(LANG_MARKERS)  # rank order = the documented tie-break
    lang_by_rank = F.array(*[F.lit(lang) for lang in langs])

    def from_hits(hits: Column) -> Column:
        entries = [
            F.struct(
                F.size(
                    F.filter(hits, _marker_filter(LANG_MARKERS[lang]))
                ).alias("c"),
                F.lit(-i).alias("neg_rank"),
            )
            for i, lang in enumerate(langs)
        ]

        def from_best(best: Column) -> Column:
            return F.when(
                best["c"] > 0,
                F.element_at(lang_by_rank, -best["neg_rank"] + 1),
            ).otherwise(F.lit("und"))

        # let-bind the argmax struct: its two references would inline
        # the whole entries tree (and every hits filter under it) twice
        return _let(F.array_max(F.array(*entries)), from_best)

    # let-bind the marker hits: referenced by every per-language count
    return _let(F.filter(src, lambda t: t.isin(*all_markers)), from_hits)


def lang_quality_gate(
    text: Column, lang: str = "en", min_quality: float = 0.5
) -> Column:
    """The fused corpus-filter predicate
    ``(lang_id(text) == lang) AND (quality_score(text) >= min_quality)``
    as ONE boolean expression sharing ONE let-bound lowered tokenization.

    Why it exists: writing the two features as separate columns and
    filtering on them lets the optimizer push the Filter below the
    feature Project, substituting each feature's full tree into the
    pushed condition — the gate then re-evaluates the whitespace split
    5x per row ON EVERY ROW even when the surviving rows' feature
    columns share one ``_lt`` column (observed in the r14
    q_pipeline_preprocess/corpus-build plans). This form is already a
    single expression, so pushdown can only move it, never duplicate
    its subtrees: one split per row at the filter, wherever it lands.
    """
    def gate(toks: Column) -> Column:
        return (_lang_from_ltoks(toks) == F.lit(lang)) & (
            _quality_from_ltoks(text, toks) >= F.lit(min_quality)
        )

    return _let(tokens(F.lower(text)), gate)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    — the exact-dedup key, reproducible in any engine. For partial-
    overlap detection use :func:`winnow_fingerprints`."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


def winnow_fingerprints(text: Column, k: int = 5, window: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every k-gram of the token stream, slide a window of ``window``
    consecutive hashes, keep each window's minimum — guaranteeing any
    match of length ≥ k+window-1 tokens shares a fingerprint, with ~2/(
    window+1) of hashes selected. The plagiarism/partial-overlap
    detector the whole-document md5 can't provide.

    All JVM array expressions over one row — no explode, no shuffle; the
    selection order is lexicographic over md5 hex strings (any total
    order on hashes is a valid winnowing selector, and string min is
    reproducible in any engine). Returns array<string> (distinct,
    sorted)."""
    empty = F.array().cast("array<string>")
    # single-pass lookahead regex builds the k-token windows (see
    # word_shingles for the mid-token-safety argument), md5 mapped
    # over the captured strings; fewer-than-k-token docs yield no
    # matches, so no explicit sequence() endpoint guard is needed
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    pat = r"(?=((?:\S+ ){" + str(k - 1) + r"}\S+))\S+ ?"
    grams = F.when(
        text.isNotNull(),
        F.transform(
            F.regexp_extract_all(norm, F.lit(pat), 1), lambda g: F.md5(g)
        ),
    ).otherwise(empty)
    n_grams = F.size(grams)
    mins = F.when(
        n_grams >= window,
        F.transform(
            F.sequence(F.lit(1), n_grams - (window - 1)),
            lambda i: F.array_min(F.slice(grams, i, window)),
        ),
    ).otherwise(empty)
    return F.sort_array(F.array_distinct(mins))


def chunk_documents(
    df,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Token-window document chunking: (id, chunk_id, chunk_text).

    The context-window preparation step of a training/RAG corpus build:
    each document becomes ⌈(n − overlap)/(chunk − overlap)⌉ windows of
    ``chunk_tokens`` whitespace tokens, consecutive windows sharing
    ``overlap`` tokens; documents shorter than one window yield exactly
    one chunk. Pure Column expressions (sequence → slice → posexplode),
    no shuffle — chunking is embarrassingly parallel and stays inside
    whole-stage codegen; output size is bounded by input tokens ×
    (1 + overlap/(chunk − overlap)).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(float(step))).cast("int"), F.lit(1)
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    windows = F.transform(
        starts,
        lambda i: F.concat_ws(" ", F.slice(toks, i * step + 1, chunk_tokens)),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(windows).alias("chunk_id", "chunk_text"),
    )


def repetition_score(text: Column, n: int = 3) -> Column:
    """Fraction of repeated n-grams in [0, 1] — the repetition-quality
    signal web-scale corpus filters use (high values flag boilerplate,
    keyword stuffing, and degenerate generations). 0 when every n-gram
    is unique, approaching 1 for pathological repetition; documents
    with fewer than n tokens score 0. Pure array expressions — shares
    :func:`word_shingles`-style slicing but keeps DUPLICATES (the
    whole point is counting them), so it cannot reuse the
    dedup shingle helper, which distincts. Gram construction is the
    same single-pass lookahead regex as the shingle helper (one JVM
    regex pass instead of an interpreted slice-per-index transform);
    duplicates are preserved because no array_distinct is applied
    before counting."""
    from pyspark.sql import functions as F  # local alias for clarity

    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    pat = r"(?=((?:\S+ ){" + str(n - 1) + r"}\S+))\S+ ?"
    grams = F.regexp_extract_all(norm, F.lit(pat), 1)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(
        total >= 1, F.round((total - distinct) / total, 6)
    ).otherwise(F.lit(0.0))


def doc_lines(text: Column, delim: str = "\n") -> Column:
    """Trimmed non-empty lines of a document as an array column."""
    return F.filter(
        F.transform(F.split(text, delim), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def gopher_repetition_signals(
    text: Column, delim: str = "\n"
) -> dict[str, Column]:
    """Gopher-style line-level repetition/format quality signals
    (Rae et al. 2021, "Scaling Language Models" §A1.1) — the
    document-structure half of web-corpus quality filtering that the
    token-level :func:`repetition_score` and :func:`quality_score`
    don't cover:

    - ``dup_line_frac``: fraction of lines that duplicate another line
      of the SAME document ((n - n_distinct) / n);
    - ``dup_line_char_frac``: fraction of line characters sitting in
      any line whose in-document occurrence count is > 1 (all
      instances counted — the boilerplate-mass measure);
    - ``ellipsis_line_frac``: lines ending in '...' or '…';
    - ``bullet_line_frac``: lines starting with a bullet marker.

    All four are pure array expressions over one split (codegen, no
    UDF, no shuffle — a map-stage annotate at any scale). The
    duplicate scan is O(lines²) per document, bounded by per-document
    line counts, not corpus size."""
    lines = doc_lines(text, delim)
    n = F.size(lines)
    safe_n = F.greatest(n, F.lit(1))
    n_distinct = F.size(F.array_distinct(lines))
    dup_lines = F.filter(
        lines,
        lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1,
    )
    dup_chars = F.aggregate(
        dup_lines, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
    )
    tot_chars = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
    )
    ellipsis = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[\-\*•]"))
    )
    return {
        "dup_line_frac": F.round((n - n_distinct) / safe_n, 6),
        "dup_line_char_frac": F.round(
            dup_chars / F.greatest(tot_chars, F.lit(1)), 6
        ),
        "ellipsis_line_frac": F.round(ellipsis / safe_n, 6),
        "bullet_line_frac": F.round(bullet / safe_n, 6),
    }


def bpe_learn(
    words: DataFrame,
    n_merges: int = 8,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Byte-pair-encoding vocabulary induction (Sennrich et al. 2016)
    as an iterative DataFrame plan: per step, the frequency-weighted
    count of adjacent symbol pairs picks the argmax pair (count desc,
    then lexicographic — deterministic), which is merged in every word
    before the next count. Returns the merge table
    (step, left, right, merged, pair_count) — the artifact a tokenizer
    trainer ships.

    Representation trick that keeps BOTH the engine and the SQL oracle
    exact: a word's symbol sequence is one string with DOUBLE-space
    separators and double-space margins (``"  h  e  y  "``). Merging
    pair (a, b) is then the plain left-to-right non-overlapping
    ``replace(" a  b " -> " ab ")`` — each match consumes one space
    from each margin, so chained occurrences still match, overlapping
    triples merge left-to-right exactly like sequential BPE, and
    symbols can never false-match across boundaries (they contain no
    spaces). ``replace`` has identical scan semantics in Spark and
    DuckDB, so an unrolled per-step SQL oracle reproduces every merge
    bit-for-bit.

    Scale: the corpus appears ONLY in the word-frequency aggregate the
    caller provides; every iteration runs on the vocabulary-bounded
    word table (one map-combinable pair count, a 1-row broadcast
    argmax, a narrow rewrite), with a lineage cut per step."""
    from .checkpointing import maybe_checkpoint

    def sym_init(c: Column) -> Column:
        # "hey" -> "  h  e  y  "
        chars = F.split(c, "")
        return F.concat(
            F.lit("  "), F.array_join(chars, "  "), F.lit("  ")
        )

    cur = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).alias("freq"),
        sym_init(F.col(word_col)).alias("sym"),
    )
    merges = None
    for step in range(1, n_merges + 1):
        syms = F.filter(F.split(F.col("sym"), "  "), lambda s: s != "")
        # guard: Spark's sequence(1, 0) DESCENDS, so a 1-symbol word
        # would index past the array — emit an empty index list instead
        pair_idx = F.when(
            F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
        ).otherwise(F.expr("array()").cast("array<int>"))
        pairs = cur.select(
            "freq",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at(syms, i).alias("a"),
                        F.element_at(syms, i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        ).select("freq", "p.a", "p.b")
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
        )
        cur = (
            cur.crossJoin(F.broadcast(top))
            .select(
                "word",
                "freq",
                F.replace(
                    F.col("sym"),
                    F.concat(F.lit(" "), F.col("a"), F.lit("  "), F.col("b"), F.lit(" ")),
                    F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" ")),
                ).alias("sym"),
                F.col("a"),
                F.col("b"),
                F.col("c"),
            )
        )
        cur = maybe_checkpoint(cur, eager=False)
        step_row = cur.limit(1).select(
            F.lit(step).alias("step"),
            F.col("a").alias("left"),
            F.col("b").alias("right"),
            F.concat("a", "b").alias("merged"),
            F.col("c").cast("bigint").alias("pair_count"),
        )
        merges = step_row if merges is None else merges.unionByName(step_row)
        cur = cur.drop("a", "b", "c")
    return merges
