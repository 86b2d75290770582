"""Deterministic hash-based sampling and dataset splitting.

Reproducible corpus subsampling is a core training-data operation: at
100 TB, RNG-based sampling (``df.sample``) is partition-layout- and
seed-coordination-dependent, whereas a CONTENT-hash rule — keep a row
iff ``h(key, salt) < rate·2³²`` — is stable across runs, cluster
sizes, repartitions, and even engines (the driver's DuckDB oracle
reproduces it exactly). Disjoint salts give independent samples; split
assignment by disjoint ranges of the same hash gives leak-free
train/val/test partitions (a document can never change split between
runs, the property dedup-then-split pipelines rely on).

The hash is the first 8 hex chars of md5 over ``key || '|' || salt``,
read as a 32-bit integer — ``conv(substr(md5(x),1,8),16,10)`` on the
Spark side, ``('0x' || substr(md5(x),1,8))::UBIGINT`` in DuckDB; both
JVM/vectorized, no UDF.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HASH_SPACE = 1 << 32


def sample_hash(key: Column, salt: str = "") -> Column:
    """Uniform 32-bit content hash of a key column (+ salt)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit("|" + salt))), 1, 8),
            16,
            10,
        )
        .cast("bigint")
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by content hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.filter(
        sample_hash(F.col(key_col), salt) < int(rate * _HASH_SPACE)
    )


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Append a ``split`` column assigning each row to one named split
    by disjoint hash ranges (fractions must sum to 1)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    h = sample_hash(F.col(key_col), salt)
    expr = None
    upper = 0.0
    names = list(fractions)
    for name in names[:-1]:
        upper += fractions[name]
        branch = F.when(h < int(upper * _HASH_SPACE), F.lit(name))
        expr = branch if expr is None else expr.when(
            h < int(upper * _HASH_SPACE), F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def group_cap(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``k`` rows per group,
    chosen by content-hash order of ``key_col`` (tie-broken by the key
    itself) — the standard "at most N documents per domain/source"
    training-mix guard. Because selection is a pure function of
    content, the kept set is stable across runs, cluster sizes, and
    repartitionings (and reproducible by the DuckDB oracle), unlike an
    RNG or arrival-order cap. The rank filter compiles to
    WindowGroupLimit: each partition retains ≤ k rows per group before
    the final per-group merge, so a hot group (one domain holding half
    the corpus) never materializes or sorts its full extent.

    NULL keys hash to NULL; the explicit asc_nulls_last ordering keeps
    them selectable but pins them LAST under both engines (Spark
    defaults NULLS FIRST ascending, DuckDB NULLS LAST — the divergence
    class that twice produced cross-engine hash mismatches here)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.asc_nulls_last(sample_hash(F.col(key_col), salt)),
        F.asc_nulls_last(key_col),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mix_corpora(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str,
    source_col: str = "source",
) -> DataFrame:
    """Weighted corpus mixing: deterministic per-source subsampling +
    tagged union — the mixture-assembly step of a training-corpus
    build (hit target source proportions by per-source sampling
    rates). Each source is sampled with its OWN salt (= the source
    name), so inclusion decisions are independent across sources and
    reproducible run-to-run; the union is a no-shuffle concatenation.
    Source frames must share a schema (unionByName).
    """
    out: DataFrame | None = None
    for name, (df, rate) in sources.items():
        part = hash_sample(df, rate, key_col, salt=name).withColumn(
            source_col, F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("sources must not be empty")
    return out


def ngram_bag(text: Column, n: int = 2) -> Column:
    """Duplicate-PRESERVING lowercased n-gram array — the bag form of
    dedup.word_shingles (which distincts): DSIR-style importance
    weights need occurrence counts, not membership. Same single-pass
    lookahead regex; documents shorter than ``n`` tokens yield an
    empty array."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    pat = r"(?=((?:\S+ ){" + str(n - 1) + r"}\S+))\S+ ?"
    return F.when(
        text.isNotNull(), F.regexp_extract_all(norm, F.lit(pat), 1)
    ).otherwise(F.array().cast("array<string>"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int | None = 10_000,
    target_pred: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Data Selection with Importance Resampling weights (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every ``raw`` document by how target-like its
    hashed n-gram distribution is. Returns one row per raw doc:
    ``(id_col, n_grams, n_target_leaning, log_weight)`` where
    log_weight = Σ_grams [log p_target(b) − log p_raw(b)] under add-1
    smoothed bucket distributions (b = the gram's hash bucket), the
    DSIR importance log-ratio; n_target_leaning counts the doc's grams
    whose bucket ratio favors the target — an INTEGER-EXACT summary of
    the same comparison ((ct+1)(Nr+B) > (cr+1)(Nt+B) in exact int64
    arithmetic), which is what the cross-engine differential oracle
    value-checks (float log sums are engine-order-sensitive; the BM25
    oracle makes the same split between exact membership and float
    score). Select with hash_sample/top-fraction over log_weight, or
    Gumbel-resample downstream.

    ``n_buckets`` is the scale path: bucket = pmod(xxhash64(gram),
    n_buckets) makes BOTH distribution dictionaries n_buckets-bounded
    (the paper's hashed n-gram trick) — at 100 TB the target dict
    broadcasts and the raw dict is one map-combinable aggregation onto
    ≤ n_buckets rows. ``n_buckets=None`` buckets by the gram string
    itself (exact n-gram DSIR) for oracle parity; its raw dictionary
    is vocabulary-sized, so the raw-side join is left to AQE instead
    of a forced broadcast.

    Shuffles: two dictionary-bounded aggregations + one doc-key
    aggregation for the per-doc sums. The empty/short doc keeps its
    row (explode_outer) with n_grams = 0 and log_weight = 0.0.

    ``target_pred`` (r15, guide §6 — one scan feeds every grain): when
    the target IS a predicate-defined subset of ``raw`` (the common
    in-corpus slice case, e.g. a held-out id slice), pass a callable
    mapping the id Column to a boolean Column instead of a ``target``
    frame. The target
    dictionary is then aggregated FROM the already-checkpointed
    ``doc_grams`` relation, eliminating the separate target scan and
    its full regex/explode pass: the corpus is read and tokenized
    exactly once for all three grains (target dict, raw dict, per-doc
    scores). Counts are identical by construction — the same exploded
    instances, filtered by the same predicate. Exactly one of
    ``target`` / ``target_pred`` must be given.
    """
    if (target is None) == (target_pred is None):
        raise ValueError("pass exactly one of target / target_pred")
    bag = ngram_bag(F.col(text_col), n)
    if n_buckets is not None:
        # guard the hash: xxhash64(NULL) is the SEED (non-null), so an
        # unguarded bucket would turn the explode_outer placeholder row
        # of every gram-less doc into a phantom gram that inflates the
        # raw distribution (same failure class as dedup_lines'
        # line_key guard)
        bucket = lambda g: F.when(  # noqa: E731
            g.isNotNull(), F.pmod(F.xxhash64(g), F.lit(n_buckets))
        )
    else:
        bucket = lambda g: g  # noqa: E731

    # checkpoint: the exploded gram relation (full raw scan + regex
    # extraction, the expensive stage) feeds two DIFFERENT exchange
    # shapes — the r_dict pre-aggregation and the scored join probe —
    # which ReuseExchange cannot unify; without the cut the corpus
    # regex pass runs twice (the dedup_substrings two-consumer
    # discipline). In target_pred mode it feeds the target dictionary
    # too — three grains, one tokenization.
    from .checkpointing import maybe_checkpoint

    doc_grams = maybe_checkpoint(
        raw.select(
            F.col(id_col).alias("id"), F.explode_outer(bag).alias("g")
        ).select("id", bucket(F.col("g")).alias("b"))
    )
    if target_pred is not None:
        t_dict = (
            doc_grams.filter(target_pred(F.col("id")))
            .filter(F.col("b").isNotNull())
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("ct"))
        )
    else:
        t_dict = (
            target.select(F.explode(bag).alias("g"))
            .select(bucket(F.col("g")).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("ct"))
        )
    r_dict = (
        doc_grams.filter(F.col("b").isNotNull())
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    nt = t_dict.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("_nt"))
    nr = r_dict.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("_nr"))
    if n_buckets is not None:
        b_row = nt.crossJoin(F.broadcast(nr)).withColumn(
            "_nb", F.lit(n_buckets).cast("bigint")
        )
    else:
        nb = (
            t_dict.select("b")
            .unionByName(r_dict.select("b"))
            .distinct()
            .agg(F.count(F.lit(1)).alias("_nb"))
        )
        b_row = nt.crossJoin(F.broadcast(nr)).crossJoin(F.broadcast(nb))

    # the target dictionary is asserted-small ONLY in hashed mode
    # (≤ n_buckets rows); unhashed it is vocabulary-sized like the raw
    # dictionary, so leave both join strategies to AQE there
    t_side = F.broadcast(t_dict) if n_buckets is not None else t_dict
    # decimal keeps the leaning cross-products EXACT at corpus scale:
    # with Nr ~ 2.5e13 grams (100 TB) a hot bucket's (ct+1)*(Nr+B)
    # exceeds int64 and Spark's non-ANSI multiply would wrap silently.
    # Operands cast to decimal(18,0) — the product's inferred type is
    # decimal(18+18+1=37, 0), inside Spark's 38-digit cap, so the
    # multiply is exact (decimal(38) operands would overflow the cap
    # and NULL out). 10^18 grams ≈ an exabyte-scale corpus bound.
    dec = "decimal(18,0)"
    scored = (
        doc_grams.join(t_side, "b", "left")
        .join(r_dict, "b", "left")
        .crossJoin(F.broadcast(b_row))
        .withColumn("_ct", F.coalesce(F.col("ct"), F.lit(0)).cast("bigint"))
        .withColumn("_cr", F.coalesce(F.col("cr"), F.lit(0)).cast("bigint"))
        .withColumn(
            "_lr",
            F.when(
                F.col("b").isNotNull(),
                F.log((F.col("_ct") + 1) / (F.col("_nt") + F.col("_nb")))
                - F.log((F.col("_cr") + 1) / (F.col("_nr") + F.col("_nb"))),
            ),
        )
        .withColumn(
            "_lean",
            F.when(
                F.col("b").isNotNull()
                & (
                    (F.col("_ct") + 1).cast(dec)
                    * (F.col("_nr") + F.col("_nb")).cast(dec)
                    > (F.col("_cr") + 1).cast(dec)
                    * (F.col("_nt") + F.col("_nb")).cast(dec)
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    # order-independent log_weight: each per-gram addend rounds to
    # decimal(38,10) (error ≤ 5e-11/gram) and the decimal sum is exact,
    # so the float total is bit-reproducible across partitionings AND
    # engines — required once the weight feeds a top-k selection
    # (dsir_gumbel_topk), where a last-ulp sum difference could flip
    # membership at the margin
    return scored.groupBy("id").agg(
        F.count(F.col("b")).cast("bigint").alias("n_grams"),
        F.sum("_lean").cast("bigint").alias("n_target_leaning"),
        F.coalesce(
            F.sum(F.col("_lr").cast("decimal(38,10)")).cast("double"),
            F.lit(0.0),
        ).alias("log_weight"),
    ).select(
        F.col("id").alias(id_col),
        "n_grams",
        "n_target_leaning",
        "log_weight",
    )


def dsir_gumbel_topk(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    salt: str = "dsir",
    temperature: float = 1.0,
    grid: int = 1_000_000,
) -> DataFrame:
    """DSIR's selection step (Xie et al. 2023 §2: importance
    RESAMPLING, not top-weight truncation): sample k documents without
    replacement with probability ∝ exp(log_weight / temperature) via
    the Gumbel-top-k trick — add an independent Gumbel(0,1) noise term
    to each doc's (tempered) log weight and take the k largest keys.
    Plain top-k over log_weight would concentrate on near-duplicates of
    the target; the noise realizes the paper's diversity-preserving
    resample.

    Determinism discipline: the Gumbel is HASH-DERIVED, not RNG —
    u = (sample_hash(id, salt) + 0.5) / 2³², g = −ln(−ln(u)) — so the
    selected set is stable across runs/partitionings/engines (the
    sampling.py content-hash rule; disjoint salts give independent
    draws). Keys are quantized to a fixed 1/grid grid (the repo's
    floor-form rounding) with id as the total-order tie-break, making
    membership integer-exact for the differential oracle.

    Returns ``(id_col, gumbel_key bigint)``, the k selected docs.
    Scale: orderBy+limit plans TakeOrderedAndProject — per-partition
    top-k, then a k-row merge on the driver; no global sort.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    u = (sample_hash(F.col(id_col), salt) + F.lit(0.5)) / F.lit(
        float(_HASH_SPACE)
    )
    g = -F.log(-F.log(u))
    key = F.col(weight_col) / F.lit(float(temperature)) + g
    return (
        weights.select(
            F.col(id_col),
            F.floor(key * grid + F.lit(0.5)).cast("bigint").alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(k)
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    n_cells: int = 4096,
) -> DataFrame:
    """Deterministic token-budget subsample: keep a content-hash-ordered
    prefix of the corpus whose token total reaches ``budget`` — the
    "cut this corpus to N tokens" step of training-mix assembly, stable
    across runs/partitionings/engines like every sampling.py rule.

    Keep rule: order docs by (sample_hash, id); a doc is kept iff the
    token sum of all docs strictly before it is < ``budget`` (so the
    first doc that crosses the budget is included and the subset's
    total is the smallest prefix total >= budget; a 0 budget keeps
    nothing).

    Scale shape — NO global sort/window: the 32-bit hash space is cut
    into ``n_cells`` order-preserving cells; one dictionary-bounded
    aggregation gives per-cell token totals, a running total over that
    (n_cells-row) dictionary classifies every cell as keep-all /
    straddle / drop, and only the ONE straddling cell (≈ corpus/n_cells
    docs — raise n_cells with corpus size) pays a per-row window. The
    cell dictionary broadcasts back onto the corpus scan.

    Returns (id_col, n_tokens) of the kept docs. NULL text counts 0
    tokens (the pack_sequences convention).
    """
    from pyspark.sql import Window

    from .text import token_count

    if budget < 0:
        raise ValueError("budget must be >= 0")
    cell_w = (_HASH_SPACE + n_cells - 1) // n_cells
    h = sample_hash(F.col(id_col), salt)
    toks = F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("bigint")
    base = df.select(
        F.col(id_col).alias("id"),
        h.alias("h"),
        toks.alias("n_tokens"),
    ).withColumn("cell", F.floor(F.col("h") / cell_w).cast("bigint"))

    cells = base.groupBy("cell").agg(F.sum("n_tokens").alias("_ct"))
    wc = Window.orderBy("cell").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the cell dictionary is n_cells-bounded — a single-partition
    # window over it is a dictionary operation, not a corpus one
    cells = cells.withColumn(
        "_before", F.coalesce(F.sum("_ct").over(wc), F.lit(0))
    )
    marked = base.join(F.broadcast(cells), "cell")
    # STRICT < for the keep-all class: a cell ending exactly AT the
    # budget may close with zero-token rows whose running total equals
    # the budget (rule: drop) — route the == case through the per-row
    # branch instead of keeping the cell wholesale
    keep_all = marked.filter(
        F.col("_before") + F.col("_ct") < budget
    ).select("id", "n_tokens", "h")
    straddle = marked.filter(
        (F.col("_before") < budget)
        & (F.col("_before") + F.col("_ct") >= budget)
    )
    wr = Window.partitionBy("cell").orderBy("h", "id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    straddle_kept = (
        straddle.withColumn(
            "_row_before",
            F.col("_before") + F.coalesce(F.sum("n_tokens").over(wr), F.lit(0)),
        )
        .filter(F.col("_row_before") < budget)
        .select("id", "n_tokens", "h")
    )
    return (
        keep_all.unionByName(straddle_kept)
        .select(F.col("id").alias(id_col), "n_tokens")
    )
