"""Similarity search over embedding columns (array<float>).

Two tiers, same contract:

- ``cosine_topk``      — exact brute-force top-k: one scan, dot products
  as JVM array expressions (F.aggregate/F.zip_with), TakeOrderedAndProject
  for the k. The baseline and the verifier for the approximate tier.
- ``lsh_topk``         — random-hyperplane LSH: H deterministic
  hyperplanes (seeded numpy, shipped as literals) → sign-bit bucket →
  probe only matching/nearby buckets. At 100 TB the bucket column is a
  partition/cluster key so a probe touches a fraction of the data;
  multi-probe widens recall.
- ``ivf_topk``         — IVF-lite: k-means-free variant using the LSH
  bucket as the inverted list key; listed here as the documented scale
  path (true k-means centroids slot in via Spark ML without changing
  the probe contract).

All-pairs similarity joins should go through dedup.minhash_lsh-style
bucketing, never a cross join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    The query vector is a literal array → the comparison is a projection
    over one scan; orderBy+limit compiles to TakeOrderedAndProject (per-
    partition heaps + driver merge, no global sort). Scores are rounded
    to stabilize float comparison across engines; ties break on id.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine(vec_d, q), round_digits).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane signature: one bit per plane, packed to bigint."""
    vec_d = F.transform(vec_col, lambda x: x.cast("double"))
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(dot(vec_d, p) > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0)
        )
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    multiprobe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (+ buckets within
    ``multiprobe_hamming`` bit flips), exact cosine within the probe set.

    The bucket predicate is an IN-list over a derivable column — with the
    corpus written partitioned/clustered by bucket, the scan prunes to
    the probed partitions; that is the 100 TB story.
    """
    planes = _hyperplanes(len(query_vector), n_planes, seed)
    signs = (planes @ np.asarray(query_vector, dtype=np.float64)) > 0
    qbucket = int(sum(1 << i for i, s in enumerate(signs) if s))
    probe = {qbucket}
    if multiprobe_hamming >= 1:
        probe |= {qbucket ^ (1 << i) for i in range(n_planes)}
    bucketed = embeddings.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    candidates = bucketed.filter(F.col("_bucket").isin(*sorted(probe)))
    return cosine_topk(candidates, query_vector, k, id_col, vec_col)


def pairwise_cosine_within_buckets(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    min_cosine: float = 0.8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: exact cosine within LSH buckets only —
    the embedding-cosine variant of MinHash-LSH dedup."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    b = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= min_cosine)
    )
