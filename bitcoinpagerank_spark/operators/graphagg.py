"""Neighbor feature aggregation (the GraphSAGE-mean step).

Not in the reference (training-data op): given per-vertex feature
vectors (embeddings), compute each vertex's aggregated neighborhood
feature — the message-passing primitive every graph-ML training
pipeline runs to build input tensors, and the natural companion of the
ANN/near-dup operators on the ``embeddings`` table.

Plan shape: one hash join (edge table ⋈ features on the neighbor end)
and one aggregate with ``dim`` per-component sums — NO posexplode (which
would multiply the edge table by the vector width) and no Python: for a
fixed dim the per-component sums are plain codegen'd aggregates, so the
shuffle carries exactly one partial-aggregate row per (vertex, grouping)
like any other groupBy. 100 TB framing: identical to the PageRank
contribs aggregate with a 64-wide value instead of a scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import DST, SRC


def neighbor_feature_mean(
    edges: DataFrame,
    features: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    direction: str = "in",
) -> DataFrame:
    """(id, n_nbrs, nbr_mean array<double>) — element-wise mean of the
    feature vectors of each vertex's neighbors.

    ``direction="in"``: aggregate the SOURCES pointing at v (who links to
    me); ``"out"``: aggregate v's link targets. Vertices with no
    neighbors in the chosen direction are absent (callers left-join the
    vertex table when they need zero vectors).
    """
    if direction not in ("in", "out"):
        raise ValueError("direction must be 'in' or 'out'")
    nbr, grp = (SRC, DST) if direction == "in" else (DST, SRC)
    feats = features.select(
        F.col(id_col).alias(nbr), F.col(vec_col).alias("_v")
    )
    sums = [
        F.sum(F.element_at("_v", i + 1).cast("double")).alias(f"_s{i}")
        for i in range(dim)
    ]
    agg = (
        edges.select(SRC, DST)
        .join(feats, nbr)
        .groupBy(F.col(grp).alias("id"))
        .agg(F.count(F.lit(1)).alias("n_nbrs"), *sums)
    )
    mean_vec = F.array(*[F.col(f"_s{i}") / F.col("n_nbrs") for i in range(dim)])
    return agg.select("id", "n_nbrs", mean_vec.alias("nbr_mean"))


def neighbor_feature_mean_hops(
    edges: DataFrame,
    features: DataFrame,
    dim: int,
    hops: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    direction: str = "in",
) -> DataFrame:
    """Iterated aggregation: hop-k mean = mean over neighbors of the
    hop-(k-1) means (the stacked-GraphSAGE-layer shape). Returns
    (id, n_nbrs, nbr_mean) after ``hops`` rounds; each round is one
    join + one aggregate over the same partitioned edge table."""
    if hops < 1:
        raise ValueError("hops must be >= 1")
    cur = features.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    out = None
    for _ in range(hops):
        out = neighbor_feature_mean(
            edges, cur, dim, id_col="vec_id", vec_col="embedding",
            direction=direction,
        )
        cur = out.select(
            F.col("id").alias("vec_id"), F.col("nbr_mean").alias("embedding")
        )
    return out
