"""K-core decomposition by iterative peeling.

Not in the reference (breadth operator for link-graph analytics, same
family as WCC/LPA/triangles). The k-core is the maximal subgraph where
every vertex has undirected degree ≥ k; computed by repeatedly deleting
vertices of degree < k until stable — the standard distributed
formulation (each round: one degree aggregate + two semi-joins, all
Catalyst). Rounds = peeling depth (worst case O(n) on a path with k=2;
typically a handful on web graphs). Convergence detection rides the
per-round eager localCheckpoint via observe() — zero extra jobs, the
pagerank.py:272 pattern.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .edges import SRC, DST, undirected_view


@dataclass
class KCoreResult:
    vertices: DataFrame  # (id: long, degree: long) — degree within the core
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> KCoreResult:
    if k < 1:
        raise ValueError("k must be >= 1")
    if num_partitions is None:
        from .edges import auto_partitions

        num_partitions = auto_partitions(spark, edges.count())

    # symmetric closure: every undirected edge appears in both directions,
    # so groupBy(src) counts the full undirected degree
    pairs = (
        undirected_view(edges)
        .repartition(num_partitions, SRC)
        .localCheckpoint(eager=True)
    )

    converged = False
    it = 0
    prev_cnt: int | None = None
    metrics: list[dict] = []
    while it < max_iter:
        t0 = time.monotonic()
        keep = (
            pairs.groupBy(F.col(SRC).alias("id"))
            .agg(F.count("*").alias("deg"))
            .where(F.col("deg") >= k)
            .select("id")
        )
        obs = Observation(f"kcore_round_{it}")
        new_pairs = (
            pairs.join(keep.withColumnRenamed("id", SRC), SRC, "left_semi")
            .join(keep.withColumnRenamed("id", DST), DST, "left_semi")
            .observe(obs, F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )
        cnt = int(obs.get["cnt"] or 0)
        it += 1
        metrics.append(
            {"iteration": it, "pairs": cnt,
             "wall_sec": time.monotonic() - t0}
        )
        pairs = new_pairs
        if cnt == prev_cnt or cnt == 0:
            converged = True
            break
        prev_cnt = cnt

    core = (
        pairs.groupBy(F.col(SRC).alias("id"))
        .agg(F.count("*").alias("degree"))
        .where(F.col("degree") >= k)
    )
    return KCoreResult(core, it, converged, metrics)
