"""Katz, eigenvector, and SALSA centrality — link-analysis breadth
operators in the PageRank/HITS family (reference analog: the same product
surface as RunPageRankBasic.java's score loop; none of these exist in the
reference — they are breadth ops mandated by the link-graph tier).

All three share the iterate shape proven out in pagerank.py / hits.py:

* the edge table is partitioned ONCE by the join key and persisted; only
  vertex-sized score tables move per iteration,
* each half-step is one equi-join + by-key hash aggregate whose global
  scalar (normalizer / total) rides the eager ``localCheckpoint`` via
  ``observe()`` — no extra pass, no driver-side reduction job,
* ``localCheckpoint(eager=True)`` truncates lineage so the logical plan
  stays O(1) per iteration (measured in BENCH.md round-3 cadence A/B),
* per-iteration lineage rows carry wall clock + shuffle bytes
  (north-star metrics contract).

Numeric contracts (all L1-style, SQL-portable so the DuckDB oracles can
unroll them as chained CTEs):

* Katz:        c' (v) = beta + alpha * SUM_{u->v} c(u), c0 = beta.
               Convergent for alpha < 1/lambda_max; raw (unnormalized)
               scores are returned — the standard fixed-point.
* eigenvector: x'(v) = SUM_{u->v} x(u) / ||SUM||_1, x0 = 1/n.  Power
  iteration with L1 norm (the L2 variant differs only by the norm and
  is not cross-engine hash-stable; L1 keeps scores exactly comparable).
* SALSA:       HITS on the row/column-STOCHASTIC adjacency — each hub
  contribution is divided by the hub's out-degree and each authority
  contribution by the authority's in-degree (Lempel & Moran 2000), with
  an explicit L1 renorm per half-step so dangling leakage cannot drift
  the total (same defensive renorm as hits.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .edges import SRC, DST, default_partitions, in_degrees, out_degrees, vertices
from .lineage import group_shuffle_bytes, job_group, next_group


@dataclass
class CentralityResult:
    scores: DataFrame
    iterations: int
    metrics: list[dict] = field(default_factory=list)


def _prepared(spark, edges, num_partitions):
    e = (
        edges.select(SRC, DST)
        .where(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
        .repartition(num_partitions, SRC)
        .persist()
    )
    e.count()
    verts = vertices(edges).repartition(num_partitions, "id").persist()
    n = verts.count()
    if n == 0:
        e.unpersist()
        raise ValueError("centrality on an empty graph")
    return e, verts, n


def katz_centrality(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    max_iter: int = 3,
    num_partitions: int | None = None,
) -> CentralityResult:
    """Katz centrality, fixed-iteration fixed point.

    ``alpha`` must be < 1/lambda_max(A) for the series to converge; the
    conservative default 0.05 is safe for any graph with max in-degree
    <= 20/alpha. No normalization — callers rank on raw scores.
    """
    if max_iter < 1:
        raise ValueError("katz_centrality needs max_iter >= 1")
    if num_partitions is None:
        num_partitions = default_partitions(spark, edges)
    e, verts, _n = _prepared(spark, edges, num_partitions)

    c = verts.withColumn("score", F.lit(float(beta))).localCheckpoint(eager=True)
    metrics: list[dict] = []
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        grp = next_group("katz", it)
        obs = Observation(f"katz_{it}")
        # ONE job per iteration: unlike eigenvector/HITS, Katz's update
        # uses only the constants alpha/beta — the observed total_recv is
        # a metrics row, not a plan input — so the receive aggregate and
        # the vertex update fuse into a single checkpointed plan (the
        # pagerank.py shape). F.sum skips nulls, so observing the fused
        # left join gives exactly the old recv-table total.
        with job_group(spark, grp, "Katz step"):
            recv = (
                e.join(c.select(F.col("id").alias(SRC), "score"), SRC)
                .groupBy(F.col(DST).alias("id"))
                .agg(F.sum("score").alias("recv"))
            )
            c = (
                verts.join(recv, "id", "left")
                .select(
                    "id",
                    (
                        F.lit(float(beta))
                        + F.lit(float(alpha)) * F.coalesce("recv", F.lit(0.0))
                    ).alias("score"),
                    F.col("recv"),
                )
                .observe(obs, F.sum("recv").alias("total_recv"))
                .localCheckpoint(eager=True)
            )
            total = float(obs.get["total_recv"] or 0.0)
        c = c.select("id", "score")
        srb, swb = group_shuffle_bytes(spark, grp)
        metrics.append(
            {"iteration": it, "total_recv": total,
             "wall_sec": time.monotonic() - t0,
             "shuffle_read_bytes": srb, "shuffle_write_bytes": swb}
        )
    e.unpersist()
    verts.unpersist()
    return CentralityResult(c, max_iter, metrics)


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 3,
    num_partitions: int | None = None,
) -> CentralityResult:
    """L1-normalized power iteration on the transpose adjacency.

    Vertices with no in-links have score 0 after the first step. The
    normalizer rides the checkpoint via ``observe()``; the division folds
    lazily into the next step's scan (hits.py pattern).
    """
    if max_iter < 1:
        raise ValueError("eigenvector_centrality needs max_iter >= 1")
    if num_partitions is None:
        num_partitions = default_partitions(spark, edges)
    e, verts, n = _prepared(spark, edges, num_partitions)

    x = verts.withColumn("score", F.lit(1.0 / n)).localCheckpoint(eager=True)
    metrics: list[dict] = []
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        grp = next_group("eigen", it)
        obs = Observation(f"eigen_{it}")
        with job_group(spark, grp, "eigenvector power step"):
            raw = (
                e.join(x.select(F.col("id").alias(SRC), "score"), SRC)
                .groupBy(F.col(DST).alias("id"))
                .agg(F.sum("score").alias("raw"))
                .observe(obs, F.sum("raw").alias("s"))
                .localCheckpoint(eager=True)
            )
            s = float(obs.get["s"] or 0.0) or 1.0
        x = verts.join(raw, "id", "left").select(
            "id", (F.coalesce("raw", F.lit(0.0)) / F.lit(s)).alias("score")
        )
        srb, swb = group_shuffle_bytes(spark, grp)
        metrics.append(
            {"iteration": it, "l1_norm": s,
             "wall_sec": time.monotonic() - t0,
             "shuffle_read_bytes": srb, "shuffle_write_bytes": swb}
        )
    e.unpersist()
    verts.unpersist()
    return CentralityResult(x, max_iter, metrics)


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 2,
    num_partitions: int | None = None,
) -> CentralityResult:
    """SALSA (Lempel & Moran 2000): HITS over the stochastic adjacency.

    Returns (id, hub, authority). The degree-divided edge table
    ``(src, dst, 1/outdeg(src), 1/indeg(dst))`` is built once and
    persisted — the per-iteration joins then touch only vertex-sized
    score tables, identical shuffle profile to hits().
    """
    if max_iter < 1:
        raise ValueError("salsa needs max_iter >= 1")
    if num_partitions is None:
        num_partitions = default_partitions(spark, edges)

    base = edges.select(SRC, DST).where(
        F.col(SRC).isNotNull() & F.col(DST).isNotNull()
    )
    e = (
        base.join(out_degrees(base).withColumnRenamed("id", SRC), SRC)
        .join(in_degrees(base).withColumnRenamed("id", DST), DST)
        .select(
            SRC, DST,
            (F.lit(1.0) / F.col("out_degree")).alias("inv_od"),
            (F.lit(1.0) / F.col("in_degree")).alias("inv_id"),
        )
        .repartition(num_partitions, SRC)
        .persist()
    )
    e.count()
    verts = vertices(base).repartition(num_partitions, "id").persist()
    n = verts.count()
    if n == 0:
        e.unpersist()
        verts.unpersist()
        raise ValueError("salsa on an empty graph")

    h = verts.withColumn("score", F.lit(1.0 / n)).localCheckpoint(eager=True)
    a = None
    metrics: list[dict] = []
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        grp = next_group("salsa", it)
        obs_a = Observation(f"salsa_a_{it}")
        with job_group(spark, grp, "SALSA authority half-step"):
            a_raw = (
                e.join(h.select(F.col("id").alias(SRC), "score"), SRC)
                .groupBy(F.col(DST).alias("id"))
                .agg(F.sum(F.col("score") * F.col("inv_od")).alias("raw"))
                .observe(obs_a, F.sum("raw").alias("s"))
                .localCheckpoint(eager=True)
            )
            sa = float(obs_a.get["s"] or 0.0) or 1.0
        a = verts.join(a_raw, "id", "left").select(
            "id", (F.coalesce("raw", F.lit(0.0)) / F.lit(sa)).alias("score")
        )
        obs_h = Observation(f"salsa_h_{it}")
        with job_group(spark, grp, "SALSA hub half-step"):
            h_raw = (
                e.join(a.select(F.col("id").alias(DST), "score"), DST)
                .groupBy(F.col(SRC).alias("id"))
                .agg(F.sum(F.col("score") * F.col("inv_id")).alias("raw"))
                .observe(obs_h, F.sum("raw").alias("s"))
                .localCheckpoint(eager=True)
            )
            sh = float(obs_h.get["s"] or 0.0) or 1.0
        h = verts.join(h_raw, "id", "left").select(
            "id", (F.coalesce("raw", F.lit(0.0)) / F.lit(sh)).alias("score")
        )
        srb, swb = group_shuffle_bytes(spark, grp)
        metrics.append(
            {"iteration": it, "authority_norm": sa, "hub_norm": sh,
             "wall_sec": time.monotonic() - t0,
             "shuffle_read_bytes": srb, "shuffle_write_bytes": swb}
        )

    scores = (
        h.select("id", F.col("score").alias("hub"))
        .join(a.select("id", F.col("score").alias("authority")), "id", "left")
        .select("id", "hub", F.coalesce("authority", F.lit(0.0)).alias("authority"))
    )
    e.unpersist()
    verts.unpersist()
    return CentralityResult(scores, max_iter, metrics)
