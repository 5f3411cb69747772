"""Deterministic random-walk sampling over the link graph.

Not in the reference (training-data pipeline operator): fixed-length
walks from every vertex are the standard corpus for node-embedding
training (DeepWalk/node2vec family) and for Monte-Carlo PageRank
estimates. Walks here are *deterministically* pseudo-random — the
neighbor choice at step s of walk w is ``lcg(w, s) mod out_degree``,
pure int64 arithmetic — so runs are reproducible across engines and the
DuckDB oracle can replay the exact same walks.

Plan shape per step (all Catalyst, no Python):
  frontier(walk_id, pos) ⋈ deg(src)   -- |V|-sized side, hash join
    → idx = lcg(walk_id, step) % deg
  ⋈ adj(src, idx → dst)               -- equi-join on (pos, idx): no
                                         neighbor fan-out, even at hubs
Walks at a dangling vertex simply stop (shorter walk emitted). The
indexed adjacency is a row_number window partitioned by src — per-vertex
sequential numbering, no global ordering, scale-safe.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .edges import SRC, DST

# lcg(w, s) = w*LCG_A + s*LCG_B + LCG_C  (mod out_degree), int64 exact in
# both Spark and DuckDB for walk ids up to ~9e12
LCG_A = 1_000_003
LCG_B = 8_191
LCG_C = 12_345


def _step_hash(walk_id, step: int):
    return walk_id * F.lit(LCG_A) + F.lit(step * LCG_B + LCG_C)


def indexed_adjacency(edges: DataFrame) -> DataFrame:
    """(src, idx, dst): distinct out-edges numbered 0..deg-1 per source,
    ordered by dst for determinism."""
    e = (
        edges.select(SRC, DST)
        .where(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
        .distinct()
    )
    w = Window.partitionBy(SRC).orderBy(DST)
    return e.withColumn("idx", F.row_number().over(w) - 1)


@dataclass
class WalkResult:
    # (walk_id, step, pos): step 0 is the start vertex; a walk shorter
    # than walk_length hit a dangling vertex
    steps: DataFrame
    walk_length: int
    walks_per_vertex: int


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_vertex: int = 1,
    num_partitions: int | None = None,
) -> WalkResult:
    """``walks_per_vertex`` deterministic walks of up to ``walk_length``
    steps from every vertex (walk_id = vertex_id * walks_per_vertex + i).
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if num_partitions is None:
        from .edges import auto_partitions

        num_partitions = auto_partitions(spark, edges.count())

    adj = indexed_adjacency(edges).repartition(num_partitions, SRC)
    adj = adj.localCheckpoint(eager=True)
    deg = (
        adj.groupBy(F.col(SRC).alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    ).localCheckpoint(eager=True)

    verts = (
        adj.select(F.col(SRC).alias("id"))
        .unionByName(adj.select(F.col(DST).alias("id")))
        .distinct()
    )
    starts = verts.crossJoin(
        spark.range(walks_per_vertex).select(F.col("id").alias("w_i"))
    ).select(
        (F.col("id") * walks_per_vertex + F.col("w_i")).alias("walk_id"),
        F.col("id").alias("pos"),
    )

    frontier = starts.localCheckpoint(eager=True)
    frames = [frontier.select("walk_id", F.lit(0).alias("step"), "pos")]
    for step in range(1, walk_length + 1):
        cur = frontier.join(deg, frontier["pos"] == deg["v"], "inner").select(
            "walk_id",
            "pos",
            F.pmod(_step_hash(F.col("walk_id"), step), F.col("deg")).alias(
                "choice"
            ),
        )
        nxt = cur.join(
            adj,
            (cur["pos"] == adj[SRC]) & (cur["choice"] == adj["idx"]),
            "inner",
        ).select("walk_id", adj[DST].alias("pos"))
        frontier = nxt.localCheckpoint(eager=True)
        frames.append(frontier.select("walk_id", F.lit(step).alias("step"), "pos"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return WalkResult(out, walk_length, walks_per_vertex)
