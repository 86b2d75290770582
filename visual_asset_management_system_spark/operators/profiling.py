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
    collects n, Σx, Σx², Σxy for every pair; the matrix rows
    ``(col_x, col_y, pearson_r)`` are scalar math over the single
    moments row, floor-form grid-rounded. Returns the upper triangle
    (col_x < col_y in ``cols`` order), unordered."""
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        aggs.append(_dsum(F.col(c), f"s_{c}"))
        aggs.append(_dsum(F.col(c) * F.col(c), f"s_{c}_{c}"))
    pairs = [(x, y) for i, x in enumerate(cols) for y in cols[i + 1:]]
    for x, y in pairs:
        aggs.append(_dsum(F.col(x) * F.col(y), f"s_{x}_{y}"))
    m = df.agg(*aggs)
    rows = []
    for x, y in pairs:
        num = F.col("n") * F.col(f"s_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        den = F.sqrt(
            F.col("n") * F.col(f"s_{x}_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")
        ) * F.sqrt(
            F.col("n") * F.col(f"s_{y}_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
        )
        rows.append(
            m.select(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                (F.floor((num / den) * round_grid + 0.5) / round_grid).alias(
                    "pearson_r"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out
