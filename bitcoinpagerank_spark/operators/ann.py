"""Approximate nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k (exact, O(n·q)); scale path: LSH
sign-bucket partitioning (deterministic pseudo-random hyperplanes from
plain arithmetic — reproducible across runs and engines) that restricts
the pair join to same-bucket candidates, trading recall for a ~2^bits
reduction in comparisons. Dot products stay in Catalyst
(``zip_with`` + ``aggregate``) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query row: top-k corpus neighbors by cosine (excluding
    self-matches by id). Returns (query_id, neighbor_id, cosine, rank).
    Ties → lower neighbor_id first (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: LCG over (j, d) → [-1, 1)."""
    vals = []
    for d in range(dim):
        x = (1_103_515_245 * (j * dim + d) + 12_345) % (2**31)
        vals.append(x / float(2**30) - 1.0)
    return vals


def lsh_bucket_col(vec: Column, dim: int, bits: int = 8, offset: int = 0) -> Column:
    """Sign-bit bucket id from ``bits`` fixed hyperplanes. ``offset`` shifts
    the hyperplane index range — hash table t uses offset=t*bits, giving
    independent bucketings for multi-table (recall-recovering) LSH."""
    bucket = F.lit(0)
    for j in range(bits):
        h = F.array(*[F.lit(v) for v in _hyperplane(offset + j, dim)])
        bit = F.when(dot_expr(vec, h) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via same-bucket candidate restriction. Recall < 1 by design;
    the bucket join replaces the cross join — at n=10^9 this is the
    difference between n·q and n·q/2^bits comparisons, and the bucket
    column doubles as the shuffle/partition key."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket_col(F.col(vec_col), dim, bits).alias("bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket_col(F.col(vec_col), dim, bits).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
