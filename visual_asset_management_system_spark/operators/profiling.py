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
    """Pairwise Pearson correlation over ``cols``: one aggregate pass
    collects per-pair moments (n, Σx, Σy, Σx², Σy², Σxy), each
    conditioned on BOTH columns being non-null — the standard pairwise
    deletion, so frames with NULLs in a profiled column get the correct
    r per pair instead of a silently shifted n. The matrix rows
    ``(col_x, col_y, pearson_r)`` are then emitted by exploding an
    array of structs computed over the single moments row — one
    FileScan, one map-combined reduce, zero repeated subtrees in the
    physical plan (the earlier per-pair ``select``+``unionAll`` shape
    re-ran the aggregate k(k−1)/2 times). Returns the upper triangle
    (col_x < col_y in ``cols`` order), unordered, floor-form
    grid-rounded."""
    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i + 1:]]
    aggs = []
    for x, y in pairs:
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        p = f"{x}_{y}"
        aggs.append(
            F.count(F.when(both, F.lit(1))).cast("double").alias(f"n_{p}")
        )
        aggs.append(_dsum(F.when(both, F.col(x)), f"sx_{p}"))
        aggs.append(_dsum(F.when(both, F.col(y)), f"sy_{p}"))
        aggs.append(_dsum(F.when(both, F.col(x) * F.col(x)), f"sxx_{p}"))
        aggs.append(_dsum(F.when(both, F.col(y) * F.col(y)), f"syy_{p}"))
        aggs.append(_dsum(F.when(both, F.col(x) * F.col(y)), f"sxy_{p}"))
    m = df.agg(*aggs)
    structs = []
    for x, y in pairs:
        p = f"{x}_{y}"
        n = F.col(f"n_{p}")
        num = n * F.col(f"sxy_{p}") - F.col(f"sx_{p}") * F.col(f"sy_{p}")
        den = F.sqrt(
            n * F.col(f"sxx_{p}") - F.col(f"sx_{p}") * F.col(f"sx_{p}")
        ) * F.sqrt(
            n * F.col(f"syy_{p}") - F.col(f"sy_{p}") * F.col(f"sy_{p}")
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
