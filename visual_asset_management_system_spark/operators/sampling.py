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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
