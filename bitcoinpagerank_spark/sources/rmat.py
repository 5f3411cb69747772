"""Deterministic R-MAT graph generator (Chakrabarti et al. 2004).

Synthetic-source breadth for stress tests: the arithmetic fixture graph
(`scripts/scaling_bench.synth_edges`) is near-regular with one planted
hub, which under-tests skew handling. R-MAT recursively drops each edge
into one of four adjacency-matrix quadrants with probabilities
(a, b, c, d), producing the power-law degree distribution real web
graphs have — the regime where hash-partitioned joins see hot keys and
AQE/salting earn their keep.

Determinism: the quadrant draw for edge k at recursion level i is an LCG
hash of (k, i) reduced mod 1000 and compared against cumulative
(a, b, c, d) thresholds — plain int64 arithmetic, so the same (n_edges,
scale, seed) always yields the identical graph on any engine or
partitioning (rand() would not), and individual edges can be replayed
for debugging. The whole generator is one Catalyst plan over
``spark.range(n_edges)``: per level two bit-shifts and a CASE — no
Python, no shuffle until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RMAT_A1 = 1_103_515_245
RMAT_A2 = 2_654_435_761 % (1 << 31)  # keep products in int64
RMAT_C = 12_345
RMAT_M = 1_000


def rmat_edges(
    spark: SparkSession,
    scale: int = 16,
    n_edges: int | None = None,
    probs: tuple[float, float, float, float] = (0.57, 0.19, 0.19, 0.05),
    seed: int = 7,
    num_partitions: int | None = None,
    dedup: bool = True,
) -> DataFrame:
    """(src_id, dst_id) over 2^scale vertices; default edge count is
    16·2^scale (the Graph500 convention). ``probs`` are quantized to
    1/1000 for the integer draw."""
    if scale < 1 or scale > 40:
        raise ValueError("scale must be in [1, 40]")
    n = 1 << scale
    if n_edges is None:
        n_edges = 16 * n
    a, b, c, _d = probs
    t_a = int(a * RMAT_M)
    t_ab = int((a + b) * RMAT_M)
    t_abc = int((a + b + c) * RMAT_M)
    base = spark.range(
        0, n_edges, numPartitions=num_partitions or 32
    ).select(F.col("id").alias("k"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    P = 2_147_483_647
    for i in range(scale):
        # per-level constant folded in Python; the squaring step breaks
        # the affine-in-k structure a plain LCG keeps (an affine draw
        # correlates all levels through one residue and collapses the
        # edge distribution — measured: 255 distinct edges out of 16k
        # draws). h1 < 2^31 so h1² stays inside int64; k·A1 bounds the
        # generator to < ~8e9 edges per call.
        lvl = (i + 1) * (seed * 1_000_003 + 1) * RMAT_A2 + RMAT_C
        h1 = (F.col("k") * RMAT_A1 + F.lit(lvl)) % P
        draw = (h1 * h1 % P + h1) % P % RMAT_M
        src_bit = F.when(draw < t_ab, 0).otherwise(1)
        dst_bit = F.when(
            (draw < t_a) | ((draw >= t_ab) & (draw < t_abc)), 0
        ).otherwise(1)
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    e = base.select(src.alias("src_id"), dst.alias("dst_id"))
    if dedup:
        from ..operators.edges import dedup_edges

        return dedup_edges(e)
    return e.where(F.col("src_id") != F.col("dst_id"))
