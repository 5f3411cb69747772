"""Single-source (or multi-source) BFS hop distances.

Not in the reference (breadth operator in the same family as WCC/LPA —
"how many clicks from the seed set is every page"). Standard distributed
frontier expansion: dist holds the settled vertices, the frontier is
joined against the out-edges each round, newly reached vertices get
dist+1. One job per round (the frontier count rides the eager
localCheckpoint via observe(), the pagerank.py pattern); rounds = graph
diameter from the seed set. All Catalyst: two hash joins + a distinct per
round on frontier-sized inputs — the |E|-scale edge table is partitioned
by src once and reused.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .edges import BROADCAST_HINT_MAX, DST, SRC
from .lineage import group_shuffle_bytes, job_group, next_group


@dataclass
class BfsResult:
    distances: DataFrame  # (id: long, dist: long) — reachable vertices only
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def bfs_distances(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list,
    max_iter: int = 100,
    num_partitions: int | None = None,
    broadcast_hints: bool = True,
) -> BfsResult:
    """Hop distance from the seed set along edge direction; unreachable
    vertices are absent from the result (callers left-join against the
    vertex table if they want nulls).

    The loop observes the frontier count every round anyway, so the
    frontier join and the settled-set anti-join carry deterministic
    ``F.broadcast`` hints while those tables are ≤ BROADCAST_HINT_MAX
    rows — the plain checkpoints' inflated size estimates would
    otherwise force a full shuffle join per round (the SCC r5 finding);
    ``broadcast_hints=False`` keeps the pure-shuffle plan selectable
    for A/B."""
    if num_partitions is None:
        from .edges import default_partitions

        num_partitions = default_partitions(spark, edges)
    if not isinstance(sources, DataFrame):
        sources = spark.createDataFrame([(int(s),) for s in sources], "id long")

    e = (
        edges.select(SRC, DST)
        .where(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
        .repartition(num_partitions, SRC)
        .localCheckpoint(eager=True)
    )

    dist = (
        sources.select(F.col("id").cast("long").alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .repartition(num_partitions, "id")
        .localCheckpoint(eager=True)
    )
    frontier = dist
    settled = f_cnt = dist.count()

    converged = False
    it = 0
    metrics: list[dict] = []
    while it < max_iter:
        t0 = time.monotonic()
        # expand: out-neighbors of the frontier not yet settled
        f_side = frontier.select(F.col("id").alias(SRC), "dist")
        if broadcast_hints and f_cnt <= BROADCAST_HINT_MAX:
            f_side = F.broadcast(f_side)
        anti_side = dist.select("id")
        if broadcast_hints and settled <= BROADCAST_HINT_MAX:
            anti_side = F.broadcast(anti_side)
        reached = (
            e.join(f_side, SRC, "inner")
            .select(F.col(DST).alias("id"), (F.col("dist") + 1).alias("dist"))
            .distinct()
            .join(anti_side, "id", "left_anti")
        )
        obs = Observation(f"bfs_round_{it}")
        grp = next_group("bfs", it)
        with job_group(spark, grp, "BFS frontier round"):
            new_frontier = reached.observe(
                obs, F.count(F.lit(1)).alias("cnt")
            ).localCheckpoint(eager=True)
            cnt = int(obs.get["cnt"] or 0)
        srb, swb = group_shuffle_bytes(spark, grp)
        it += 1
        metrics.append(
            {"iteration": it, "frontier": cnt,
             "wall_sec": time.monotonic() - t0,
             "shuffle_read_bytes": srb, "shuffle_write_bytes": swb}
        )
        if cnt == 0:
            converged = True
            break
        dist = dist.unionByName(new_frontier).localCheckpoint(eager=True)
        frontier = new_frontier
        f_cnt = cnt
        settled += cnt
    return BfsResult(dist, it, converged, metrics)


def labeled_bfs(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list,
    max_iter: int = 100,
    num_partitions: int | None = None,
    broadcast_hints: bool = True,
) -> BfsResult:
    """Per-source hop distances: (src, id, dist) for every (seed, vertex)
    pair with a directed path seed→vertex. Same frontier loop as
    ``bfs_distances`` with the seed id carried through the expansion, so
    state is O(|S|·|V|) — callers pass a seed SAMPLE (the Eppstein-Wang
    estimator regime), not the full vertex set."""
    if num_partitions is None:
        from .edges import default_partitions

        num_partitions = default_partitions(spark, edges)
    if not isinstance(sources, DataFrame):
        sources = spark.createDataFrame([(int(s),) for s in sources], "id long")

    e = (
        edges.select(SRC, DST)
        .where(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
        .repartition(num_partitions, SRC)
        .localCheckpoint(eager=True)
    )
    dist = (
        sources.select(F.col("id").cast("long").alias("src"))
        .distinct()
        .select("src", F.col("src").alias("id"), F.lit(0).cast("long").alias("dist"))
        .repartition(num_partitions, "id")
        .localCheckpoint(eager=True)
    )
    frontier = dist
    settled = f_cnt = dist.count()

    converged = False
    it = 0
    metrics: list[dict] = []
    while it < max_iter:
        t0 = time.monotonic()
        f_side = frontier.select(F.col("id").alias(SRC), "src", "dist")
        if broadcast_hints and f_cnt <= BROADCAST_HINT_MAX:
            f_side = F.broadcast(f_side)
        anti_side = dist.select("src", "id")
        if broadcast_hints and settled <= BROADCAST_HINT_MAX:
            anti_side = F.broadcast(anti_side)
        reached = (
            e.join(f_side, SRC)
            .select("src", F.col(DST).alias("id"), (F.col("dist") + 1).alias("dist"))
            .distinct()
            .join(anti_side, ["src", "id"], "left_anti")
        )
        obs = Observation(f"lbfs_round_{it}")
        grp = next_group("lbfs", it)
        with job_group(spark, grp, "labeled BFS frontier round"):
            new_frontier = reached.observe(
                obs, F.count(F.lit(1)).alias("cnt")
            ).localCheckpoint(eager=True)
            cnt = int(obs.get["cnt"] or 0)
        srb, swb = group_shuffle_bytes(spark, grp)
        it += 1
        metrics.append(
            {"iteration": it, "frontier": cnt,
             "wall_sec": time.monotonic() - t0,
             "shuffle_read_bytes": srb, "shuffle_write_bytes": swb}
        )
        if cnt == 0:
            converged = True
            break
        dist = dist.unionByName(new_frontier).localCheckpoint(eager=True)
        frontier = new_frontier
        f_cnt = cnt
        settled += cnt
    return BfsResult(dist, it, converged, metrics)


def harmonic_centrality(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, harmonic, n_sources) — inbound harmonic centrality estimated
    from a seed sample: harmonic(v) = Σ_{s ∈ S, s≠v, s→v} 1/d(s, v)
    (the Eppstein-Wang sampled estimator; exact when S = all vertices).
    One labeled BFS + one aggregate."""
    res = labeled_bfs(spark, edges, sources, max_iter, num_partitions)
    return (
        res.distances.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"),
            F.count(F.lit(1)).alias("n_sources"),
        )
    )


def closeness_centrality(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, closeness, sum_dist, n_sources) — inbound closeness
    centrality estimated from a seed sample: closeness(v) =
    |S_v| / Σ_{s ∈ S_v} d(s, v) over the seeds S_v that reach v (the
    sampled analog of the classic (n-1)/Σd definition; exact when S =
    all vertices). Same one-labeled-BFS + one-aggregate shape as
    ``harmonic_centrality`` — harmonic rewards being near ANY seed,
    closeness penalizes total distance."""
    res = labeled_bfs(spark, edges, sources, max_iter, num_partitions)
    return (
        res.distances.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            (F.count(F.lit(1)) / F.sum("dist")).alias("closeness"),
            F.sum("dist").alias("sum_dist"),
            F.count(F.lit(1)).alias("n_sources"),
        )
    )


def eccentricity_sample(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, eccentricity, n_reached) — forward eccentricity per seed:
    the max hop distance over the seed's reachable set (0 if the seed
    reaches nothing). One labeled BFS + one per-seed aggregate; seeds are
    a sample, making this the standard scalable diameter lower-bound
    probe (exact all-pairs eccentricity is O(V·E) and not a 100 TB op)."""
    res = labeled_bfs(spark, edges, sources, max_iter, num_partitions)
    return res.distances.groupBy("src").agg(
        F.max("dist").alias("eccentricity"),
        (F.count(F.lit(1)) - 1).alias("n_reached"),
    )


def effective_diameter(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list,
    q: float = 0.9,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """1-row (n_pairs, diameter_lb, effective_diameter) over the sampled
    (seed, vertex) distance distribution: diameter_lb = max observed
    distance, effective_diameter = interpolated q-quantile (classic
    ANF/HyperANF summary statistic, here exact over the seed sample)."""
    res = labeled_bfs(spark, edges, sources, max_iter, num_partitions)
    d = res.distances.where(F.col("dist") > 0)
    return d.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max("dist").alias("diameter_lb"),
        F.percentile(F.col("dist"), F.lit(q)).alias("effective_diameter"),
    )
