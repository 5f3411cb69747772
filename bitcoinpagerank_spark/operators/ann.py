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


def _seed_centroid(j: int, dim: int) -> list[float]:
    """Deterministic unit-sphere-ish seed centroid (LCG, engine-portable)."""
    return _hyperplane(1_000 + j, dim)


def ivf_train_centroids(
    embeddings: DataFrame,
    dim: int,
    n_lists: int = 8,
    lloyd_iters: int = 2,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """IVF coarse quantizer: k-means with deterministic LCG seeds and a
    fixed number of Lloyd iterations — reproducible across runs/engines
    (no sampling, no RNG). Each iteration is one assign (argmin over the
    broadcast centroid table, pure Catalyst) + one groupBy-avg over the
    posexploded vector — two shuffles total per iteration, scales to any
    corpus size. Returns driver-side centroids (n_lists × dim floats — tiny)."""
    cents = [_seed_centroid(j, dim) for j in range(n_lists)]
    v = embeddings.select(F.col(vec_col).alias("v"))
    for _ in range(lloyd_iters):
        assigned = v.withColumn(
            "list_id", ivf_assign_col(F.col("v"), cents)
        )
        means = (
            assigned.select(
                "list_id", F.posexplode("v").alias("d", "x")
            )
            .groupBy("list_id", "d")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = {}
        for r in means:
            new.setdefault(r["list_id"], [0.0] * dim)[r["d"]] = r["m"]
        # empty lists keep their previous centroid (deterministic)
        cents = [new.get(j, cents[j]) for j in range(len(cents))]
    return cents


def ivf_assign_col(vec: Column, centroids: list[list[float]]) -> Column:
    """list_id = argmin_j ||v - c_j||² = argmax_j (2·v·c_j − ||c_j||²);
    ties → lower j. Pure Catalyst (no UDF): a fold over the centroid list."""
    best_id, best_score = F.lit(0), F.lit(None).cast("double")
    for j, c in enumerate(centroids):
        cc = sum(x * x for x in c)
        h = F.array(*[F.lit(float(x)) for x in c])
        score = 2.0 * dot_expr(vec, h) - F.lit(float(cc))
        better = best_score.isNull() | (score > best_score)
        best_id = F.when(better, F.lit(j)).otherwise(best_id)
        best_score = F.when(better, score).otherwise(best_score)
    return best_id.cast("int")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed into their
    nearest coarse-quantizer list; each query probes its ``nprobe``
    nearest lists and brute-forces only those. At 10^9 vectors the
    candidate space shrinks ~n_lists/nprobe-fold and list_id is the
    shuffle key. Recall < 1 by design (raise nprobe to recover)."""
    if centroids is None:
        centroids = ivf_train_centroids(embeddings, dim, n_lists)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        ivf_assign_col(F.col(vec_col), centroids).alias("list_id"),
    )
    # per-query probe lists: rank centroids by the same score, take nprobe
    probes = []
    for j, cent in enumerate(centroids):
        cc = sum(x * x for x in cent)
        h = F.array(*[F.lit(float(x)) for x in cent])
        probes.append(
            F.struct(
                (2.0 * dot_expr(F.col("qv"), h) - F.lit(float(cc))).alias("s"),
                F.lit(j).alias("list_id"),
            )
        )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn(
        "list_id",
        F.explode(
            F.slice(
                F.reverse(F.array_sort(F.array(*probes))), 1, nprobe
            )["list_id"]
        ),
    )
    scored = (
        q.join(c, "list_id")
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


def label_centroids(
    embeddings: DataFrame,
    dim: int,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, pos, c) — per-label elementwise mean embedding.

    The mean is computed as ``dim`` per-component avg aggregates in ONE
    hash agg (whole-stage codegen; shuffle rows = #labels, each carrying
    dim doubles) — not via posexplode, which would shuffle dim× the input
    row count. The wide row is unpivoted to (pos, c) pairs afterwards
    with ``stack`` — driver-free and output-sized."""
    aggs = [
        F.avg(F.col(vec_col)[i].cast("double")).alias(f"c{i}") for i in range(dim)
    ]
    wide = embeddings.groupBy(F.col(label_col).alias("label")).agg(*aggs)
    stack = ", ".join(f"{i}, c{i}" for i in range(dim))
    return wide.select(
        "label", F.expr(f"stack({dim}, {stack}) AS (pos, c)")
    )


def kmeans_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, cosine) — nearest-centroid assignment (one k-means E
    step) by cosine; ties broken toward the lower centroid id.

    ``centroids`` is (cid, cv) and is broadcast — the candidate join is
    |rows|×k with zero shuffle on the big side; the per-row argmax is a
    key-partitioned window over k rows (bounded state)."""
    c = F.broadcast(centroids.select("cid", "cv"))
    scored = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(c)
        .select("id", "cid", cosine_expr(F.col("v"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "cid", "cosine")
    )


def standardize_embeddings(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pos, z) — per-dimension z-score standardization (feature
    scaling before clustering / ANN / linear probes; population std).

    One pass computes 2·dim aggregates (avg, avg-of-squares per
    component) in a single codegen'd hash agg — the same no-posexplode
    discipline as ``label_centroids`` — then the 1-row stats table is
    broadcast and every vector is scaled with an index lambda.
    sd = 0 dimensions (constant feature) map to z = 0 rather than NaN.
    Output is unpivoted to (id, pos, z) rows so the result is
    hash-comparable across engines."""
    v = F.col(vec_col)
    aggs = [F.avg(v[i].cast("double")).alias(f"m{i}") for i in range(dim)] + [
        F.avg(v[i].cast("double") * v[i].cast("double")).alias(f"s{i}")
        for i in range(dim)
    ]
    stats = embeddings.agg(*aggs).select(
        F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("mu"),
        F.array(
            *[
                F.sqrt(
                    F.greatest(
                        F.col(f"s{i}") - F.col(f"m{i}") * F.col(f"m{i}"),
                        F.lit(0.0),
                    )
                )
                for i in range(dim)
            ]
        ).alias("sd"),
    )
    z = F.transform(
        v,
        lambda x, i: F.round(
            F.when(F.element_at("sd", i + 1) == 0.0, F.lit(0.0)).otherwise(
                (x.cast("double") - F.element_at("mu", i + 1))
                / F.element_at("sd", i + 1)
            ),
            6,
        ),
    )
    return (
        embeddings.crossJoin(F.broadcast(stats))
        .select(F.col(id_col).alias("id"), z.alias("zv"))
        .select("id", F.posexplode("zv").alias("pos", "z"))
    )
