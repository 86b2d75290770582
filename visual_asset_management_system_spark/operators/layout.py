"""Z-order (Morton-curve) data layout — multi-dimensional scan pruning.

A table range-partitioned on ONE column prunes scans on that column
only; a 100 TB fact table queried by (customer, date) boxes, (part,
supplier) pairs, or (lat, lon) tiles needs locality in EVERY queried
dimension at once. Interleaving the bits of the dimension keys into a
single Morton code and range-partitioning + sorting on it gives each
physical partition a small bounding box in the full key space, so a
multi-dimensional box predicate touches only the partitions whose
boxes intersect it — the mechanism behind Delta's ``OPTIMIZE ZORDER
BY`` and ClickHouse/Iceberg space-filling-curve clustering, here as a
plain DataFrame transform over JVM bitwise expressions (no UDFs).

Two pieces:

- :func:`zorder_key` — the Morton code as a Column: each dimension is
  rank-normalized to ``bits`` unsigned bits by the CALLER (equal-
  population quantile bucketing keeps the curve balanced under any
  value distribution; :func:`quantize_sampled` is the production path,
  :func:`quantize` the exact ntile form the cross-engine oracle uses),
  then the bit-planes are interleaved with shift/and/or expressions
  unrolled at plan-build time.
- :func:`cluster_by_zorder` — repartitionByRange + sortWithinPartitions
  on the code: the write-path layout pass. At 100 TB this runs as the
  table's OPTIMIZE job (one range shuffle); readers then prune via
  ordinary min/max file statistics on the preserved dimension columns.

The pruning win is ASSERTED, not assumed, in
tests/test_operators.py::test_zorder_clustering_confines_box_queries:
after clustering, a 2-D box query's matching rows concentrate in a
small fraction of partitions, vs ~all partitions under 1-D layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton code: bit j of dimension i lands at position
    ``j * ndims + i`` — built as an OR-reduction of shifted bit-planes,
    entirely JVM-side (whole-stage-codegen'd comparisons and shifts)."""
    ndims = len(cols)
    out = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        for j in range(bits):
            bit = F.shiftright(c.cast("bigint"), j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * ndims + i))
    return out


def zorder_key(dim_cols: list[str], bits: int = 8) -> Column:
    """Morton code over ALREADY-QUANTIZED dimensions (each value in
    ``[0, 2**bits)``). Use :func:`quantize` for rank normalization."""
    return _interleave([F.col(c) for c in dim_cols], bits)


def quantize(col: str, bits: int = 8) -> Column:
    """Rank-normalize a column to ``2**bits`` equal-population buckets
    (0-based). ntile needs a global order — one window over the full
    relation — which is the same cost class as the range shuffle the
    layout pass already pays; at scale Delta approximates this with a
    sampled range-bounds pass, an accepted substitute because bucket
    SKEW only degrades pruning, never correctness."""
    return (
        F.ntile(2**bits).over(Window.orderBy(F.col(col), F.monotonically_increasing_id()))
        - 1
    ).cast("bigint")


def quantize_sampled(df: DataFrame, col: str, bits: int = 8) -> Column:
    """Rank-normalize via SAMPLED quantile bounds (the production path,
    Delta's range-bounds pass): one approxQuantile job collects the
    ``2**bits - 1`` split points (a few hundred doubles — driver-safe at
    any data size), and bucketing is then a per-row fold over the
    broadcast literal splits — no global window, no extra shuffle.
    Approximate splits skew bucket POPULATIONS, which degrades pruning
    tightness only, never correctness."""
    splits = df.approxQuantile(
        col, [i / 2**bits for i in range(1, 2**bits)], 0.001
    )
    arr = F.array(*[F.lit(float(s)) for s in splits])
    return F.aggregate(
        arr,
        F.lit(0).cast("bigint"),
        lambda acc, s: acc
        + F.when(F.col(col).cast("double") >= s, 1).otherwise(0).cast("bigint"),
    )


def cluster_by_zorder(
    df: DataFrame,
    dim_cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Physically cluster ``df`` along the Morton curve of ``dim_cols``.

    Quantizes each dimension with the sampled-bounds pass
    (:func:`quantize_sampled` — equal-population up to sampling error,
    no global window), interleaves, then range-partitions + sorts on
    the code. The quantized helper columns are dropped; the original
    columns are untouched, so file-level min/max statistics on them
    become tight after the re-layout — that's what downstream scans
    prune with."""
    qcols = [f"__zq_{c}" for c in dim_cols]
    out = df
    for c, qc in zip(dim_cols, qcols):
        out = out.withColumn(qc, quantize_sampled(df, c, bits))
    out = out.withColumn("__zval", _interleave([F.col(q) for q in qcols], bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        out.repartitionByRange(parts, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval", *qcols)
    )
