"""Damped power-iteration PageRank with dangling-mass redistribution.

Contract (SURVEY.md §2.12, from the reference's RunPageRankBasic.java):
  1. init: every vertex starts at 1/N            (BuildPageRankRecords.java:45)
  2. distribute: out-degree-d vertex sends p/d to each out-neighbor
                                                 (RunPageRankBasic.java:71-88)
  3. missing mass: 1 - Σ received                (RunPageRankBasic.java:344-347)
  4. update: p' = α/N + (1-α)(p_recv + missing/N), α=0.15
                                                 (RunPageRankBasic.java:230-246)
  5. terminate: L1 delta ≤ tol (north_rule upgrade of the reference's
     fixed iteration count, RunPageRankBasic.java:329-331)

Numeric domain: linear float64 (deliberate divergence from the reference's
float32 log-space ``sumLogProbs``, RunPageRankBasic.java:483-495 — see
SURVEY.md §4.3; the 1e-6 allclose bar is met directly).

Execution shape per iteration (vs the reference's 2 MapReduce jobs + 2 full
HDFS graph materializations + driver side-file fold per iteration,
RunPageRankBasic.java:339-351,423-429):
  - one cheap aggregate on the cached ranks (dangling mass — replaces the
    per-reducer side-file protocol of RunPageRankBasic.java:162-176)
  - one join ranks⋈contributions + groupBy(dst).sum (Spark does map-side
    partial aggregation automatically — the reference's optional combiner,
    RunPageRankBasic.java:180-210, is always-on here)
  - one action computing (L1 delta, total mass) in a single pass
  - localCheckpoint to truncate lineage; graph stays in executor memory —
    zero per-iteration disk round-trips of the edge table.

Two physical strategies:
  - ``edges``: pure DataFrame join/agg — Catalyst/Tungsten end-to-end,
    whole-stage codegen, AQE-compatible. Default.
  - ``csr``:   per-partition CSR blocks (numpy gather inside a cogrouped
    Arrow UDF) — the north_star's explicit layout; wins when the rank
    join dominates and degrees are skewed (salted blocks cap block size).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import (
    SRC,
    DST,
    default_partitions,
    contributions_table,
    out_degrees,
    vertices,
)
from .lineage import group_shuffle_bytes, job_group, next_group

ALPHA = 0.15  # jump probability, RunPageRankBasic.java:246
DEFAULT_TOL = 1e-6
# Default iterate-join shape: pinned shuffled-hash, NOT broadcast.
# Interleaved A/B (local[16] pinned, 6 fixed iterations, medians of 3,
# see BENCH.md): broadcasting the per-iteration scores into the edge-side
# join is 18% slower at 50k vertices (2.37 s vs 1.96 s) and 25-30% slower
# at 2M vertices (13.4 s vs 10.1 s) — the scores CHANGE every iteration,
# so broadcast re-pays driver collect + re-broadcast serialization each
# round, while the shuffled exchange between co-located executors is
# plain memory traffic and contribs' src-partitioning is reused either
# way. pagerank(broadcast_ranks=True) remains available for topologies
# where an exchange is genuinely expensive (e.g. many small executors,
# tiny |V|, cross-rack shuffle).
BROADCAST_RANKS_DEFAULT = False


@dataclass
class IterationMetrics:
    """Per-iteration lineage row (upgrade of Hadoop counters +
    MyUtils.generateReport wall-clock files, MyUtils.java:12-22).
    ``shuffle_read_bytes``/``shuffle_write_bytes`` sum the iteration's
    stages from the app status store (north_star lineage wording);
    0 when the status surface is unavailable."""

    iteration: int
    delta_l1: float
    total_mass: float
    missing_mass: float
    edges_processed: int
    num_partitions: int
    wall_sec: float
    shuffle_read_bytes: int = 0
    shuffle_write_bytes: int = 0


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id: long, score: double)
    iterations: int
    converged: bool
    metrics: list[IterationMetrics] = field(default_factory=list)
    # per-partition lineage (north_rule): [(part, edge_count)] under the
    # run's pmod(src_id, P) layout, recorded once per run
    partition_lineage: list[tuple[int, int]] = field(default_factory=list)

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        rows = [vars(m) for m in self.metrics]
        return spark.createDataFrame(
            rows,
            schema=(
                "iteration int, delta_l1 double, total_mass double, "
                "missing_mass double, edges_processed long, "
                "num_partitions int, wall_sec double, "
                "shuffle_read_bytes long, shuffle_write_bytes long"
            ),
        )


def _init_state(
    spark: SparkSession, edges: DataFrame, num_partitions: int,
    weight_col: str | None = None,
) -> tuple[DataFrame, DataFrame, int, int]:
    """Build (ranks0, contribs, n_vertices, n_edges).

    ranks carries a precomputed ``dangling`` flag so the per-iteration
    missing-mass aggregate is a scan of the cached ranks, not a join.
    """
    verts = vertices(edges)
    deg = out_degrees(edges)
    base = (
        verts.join(deg, "id", "left")
        .select("id", F.col("out_degree").isNull().alias("dangling"))
        .repartition(num_partitions, "id")
    )
    base = base.persist()
    n = base.count()
    if n == 0:
        raise ValueError(
            "PageRank on an empty graph: edge table has no non-null edges"
        )
    contribs = contributions_table(edges, num_partitions, weight_col).persist()
    n_edges = contribs.count()
    ranks0 = base.withColumn("score", F.lit(1.0 / n))
    return ranks0, contribs, n, n_edges


def _edges_step(
    ranks: DataFrame, contribs: DataFrame, n: int, missing: float, alpha: float,
    num_partitions: int | None = None,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """One power-iteration step via DataFrame join + hash aggregate.

    Two physical shapes for the scores⋈contributions join, chosen by the
    caller on vertex count (SURVEY §2.3 J6's "broadcast/shuffle hash
    join"):
    - ``broadcast_ranks=True`` (|V| under the broadcast threshold): the
      iteration's scores are broadcast into the edge-side join — no
      exchange on either join side; the only shuffle left is the
      by-destination aggregate.
    - shuffled hash join pinned via SHUFFLE_HASH otherwise (the loop sets
      preferSortMergeJoin=false): contribs' src-partitioning is reused and
      the |V|-side builds the hash table; sort-merge would re-sort the
      |E|-scale table every iteration.
    The old score is carried through so the convergence aggregate needs
    no second join.

    Measured (48M edges, 16 pinned cores, interleaved A/B): the standard
    partial+final hash aggregate beats an explicit repartition(dst) +
    complete-agg variant by ~10%/iteration even though the partial agg
    spills ~460 MB and compacts little — the spill writes are page-cache
    absorbed and the partial pass warms the rows for the shuffle writer,
    so the default plan is kept."""
    scores = ranks.select("id", "score")
    scores = F.broadcast(scores) if broadcast_ranks else scores.hint("SHUFFLE_HASH")
    recv = (
        contribs.join(scores, contribs[SRC] == F.col("id"), "inner")
        .select(F.col(DST), (F.col("score") * F.col("weight")).alias("mass"))
        .groupBy(DST)
        .agg(F.sum("mass").alias("recv"))
    )
    new_score = F.lit(alpha / n) + F.lit(1.0 - alpha) * (
        F.coalesce(F.col("recv"), F.lit(0.0)) + F.lit(missing / n)
    )
    # same flag covers the update join: broadcasting the (≤|V|-row)
    # aggregated recv side leaves the cached ranks partitioning untouched
    recv_side = F.broadcast(recv) if broadcast_ranks else recv
    return ranks.join(recv_side, ranks["id"] == recv[DST], "left").select(
        "id",
        "dangling",
        new_score.alias("score"),
        F.col("score").alias("old_score"),
    )


# NOTE on a rejected design: keeping the dangling mass in-plan (a 1-row
# broadcast aggregate cross-joined into the update) to chain k lazy steps
# per driver action was measured 3-4× SLOWER — each unmaterialized step is
# re-executed by all three consumer branches of the next step (the miss
# aggregate, the contributions join, and the final left join), giving
# ~3^k recompute. One materialized step per action wins.


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = ALPHA,
    tol: float = DEFAULT_TOL,
    max_iter: int = 100,
    num_partitions: int | None = None,
    strategy: str = "edges",
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 10,
    start_iteration: int = 0,
    start_ranks: DataFrame | None = None,
    prior_metrics: list["IterationMetrics"] | None = None,
    csr_max_block_edges: int | None = None,
    weight_col: str | None = None,
    broadcast_ranks: bool | None = None,
) -> PageRankResult:
    """Run PageRank on a (src_id, dst_id) edge DataFrame.

    ``weight_col`` names an explicit per-edge weight column: vertex u then
    sends score(u)·w(u,v)/Σw(u,·) along each edge (weighted PageRank;
    unweighted = all weights equal). Only the ``edges`` strategy supports
    weights.

    ``edges`` need not be pre-deduplicated — callers that want reference
    parity (BuildTextGraph dedup) should pass ``dedup_edges(e)``; parallel
    edges here simply contribute multiple times (multigraph semantics,
    BuildTextMultigraph.java:76-92).

    Resumability: pass ``checkpoint_dir`` to write a snapshot every
    ``checkpoint_interval`` iterations (ranks parquet + JSON manifest with
    per-iteration lineage metrics). ``resume_pagerank`` continues from the
    latest snapshot — analog of the reference's ``iter%04d`` HDFS dirs
    (RunPageRankBasic.java:359-361) without materializing every iteration.
    ``checkpoint_dir`` may be any Hadoop-supported scheme (``file://``,
    ``hdfs://``, ``s3a://``): snapshot I/O goes through
    ``sources.tablestore.TableStore`` — Iceberg snapshot commits when the
    runtime is on the classpath, else parquet + a Hadoop-FS-written JSON
    manifest.
    ``prior_metrics`` seeds the lineage history so snapshots written during
    a resumed run carry the full pre-resume trajectory (a second
    interrupt+resume keeps every iteration's metrics).
    """
    if num_partitions is None:
        num_partitions = default_partitions(spark, edges)

    if strategy == "csr":
        if weight_col is not None:
            raise ValueError("weight_col requires strategy='edges'")
        from .csr import csr_step, build_csr_blocks  # local import: optional path

    # Pin the iterate loop's partitioning: AQE coalescing would re-plan
    # every iteration (driver-serial work) and destabilize the per-partition
    # lineage rows (SURVEY.md §4.2 R3). Measured ~20% faster at local[16]
    # with AQE off for this loop; restored afterwards.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    smj_before = spark.conf.get("spark.sql.join.preferSortMergeJoin", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # hash joins, not sort-merge: the iterate loop would otherwise re-SORT
    # the |E|-scale contributions table AND both |V|-scale sides of the
    # update join EVERY iteration; a shuffled hash join streams the big
    # side and builds on the vertex side (always the smaller one here)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    try:
        return _pagerank_loop(
            spark, edges, alpha, tol, max_iter, num_partitions, strategy,
            checkpoint_dir, checkpoint_interval, start_iteration, start_ranks,
            prior_metrics, csr_max_block_edges, weight_col, broadcast_ranks,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", smj_before)


def _pagerank_loop(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float,
    tol: float,
    max_iter: int,
    num_partitions: int,
    strategy: str,
    checkpoint_dir: str | None,
    checkpoint_interval: int,
    start_iteration: int,
    start_ranks: DataFrame | None,
    prior_metrics: list[IterationMetrics] | None = None,
    csr_max_block_edges: int | None = None,
    weight_col: str | None = None,
    broadcast_ranks: bool | None = None,
) -> PageRankResult:
    if strategy == "csr":
        from .csr import csr_step, build_csr_blocks, DEFAULT_MAX_BLOCK_EDGES

    ranks0, contribs, n, n_edges = _init_state(
        spark, edges, num_partitions, weight_col
    )
    if broadcast_ranks is None:
        broadcast_ranks = BROADCAST_RANKS_DEFAULT
    if start_ranks is not None:
        ranks = (
            start_ranks.join(ranks0.select("id", "dangling"), "id", "inner")
            .select("id", "dangling", "score")
            .repartition(num_partitions, "id")
        )
    else:
        ranks = ranks0
    ranks = ranks.localCheckpoint(eager=True)

    csr_blocks = None
    if strategy == "csr":
        csr_blocks = build_csr_blocks(
            edges,
            num_partitions,
            max_block_edges=csr_max_block_edges or DEFAULT_MAX_BLOCK_EDGES,
        ).persist()
        csr_blocks.count()

    from .edges import partition_lineage as _plin

    part_lineage = [
        (r["part"], r["edge_count"])
        for r in _plin(contribs, num_partitions).collect()
    ]

    # missing mass for the first step: Σ score over dangling vertices (one
    # scan of the cached ranks; afterwards each iteration's single aggregate
    # hands back the NEXT iteration's dangling mass for free — replaces the
    # reference's per-reducer side files + driver fold).
    missing = (
        ranks.where(F.col("dangling")).agg(F.sum("score").alias("m")).first()["m"]
        or 0.0
    )

    metrics: list[IterationMetrics] = list(prior_metrics or [])
    converged = False
    it = start_iteration
    while it < max_iter:
        t0 = time.monotonic()
        if strategy == "csr":
            new_ranks = csr_step(ranks, csr_blocks, n, missing, alpha, num_partitions)
        else:
            new_ranks = _edges_step(ranks, contribs, n, missing, alpha,
                                    num_partitions,
                                    broadcast_ranks=broadcast_ranks)

        # ONE job per iteration: the convergence metrics ride the checkpoint
        # materialization itself via observe() — (L1 delta, total mass, next
        # dangling mass) cost zero extra stages. Checksum analog of
        # CheckSumPageRank.java:44-55; side-file analog per SURVEY §2.1 S8.
        from pyspark.sql import Observation

        obs = Observation(f"pr_iter_{it}")
        group = next_group("pr", it)
        with job_group(spark, group, "pagerank iteration"):
            new_ranks = new_ranks.observe(
                obs,
                F.sum(F.abs(F.col("score") - F.col("old_score"))).alias("delta"),
                F.sum("score").alias("total"),
                F.sum(
                    F.when(F.col("dangling"), F.col("score")).otherwise(0.0)
                ).alias("dm"),
            ).localCheckpoint(eager=True)
            agg = obs.get
        srb, swb = group_shuffle_bytes(spark, group)
        delta, total = float(agg["delta"]), float(agg["total"])
        it += 1
        metrics.append(
            IterationMetrics(
                iteration=it,
                delta_l1=delta,
                total_mass=total,
                missing_mass=missing,
                edges_processed=n_edges,
                num_partitions=num_partitions,
                wall_sec=time.monotonic() - t0,
                shuffle_read_bytes=srb,
                shuffle_write_bytes=swb,
            )
        )
        ranks = new_ranks.select("id", "dangling", "score")
        missing = float(agg["dm"])
        if checkpoint_dir and it % checkpoint_interval == 0:
            _write_snapshot(ranks, metrics, it, checkpoint_dir,
                            part_lineage=part_lineage)
        if delta <= tol:
            converged = True
            break

    if checkpoint_dir:
        _write_snapshot(ranks, metrics, it, checkpoint_dir, final=True,
                        part_lineage=part_lineage)
    result = ranks.select("id", "score")
    return PageRankResult(result, it, converged, metrics, part_lineage)


# ---------------------------------------------------------------- snapshots
#
# All snapshot I/O goes through sources.tablestore.TableStore: ranks
# tables land as Iceberg snapshot commits when the runtime is present,
# else partitioned parquet; the JSON lineage manifest is written through
# the Hadoop FS layer either way, so --checkpoint-dir accepts any
# Hadoop-supported scheme (file://, hdfs://, s3a://).


def _write_snapshot(
    ranks: DataFrame,
    metrics: list[IterationMetrics],
    iteration: int,
    checkpoint_dir: str,
    final: bool = False,
    part_lineage: list | None = None,
) -> None:
    from ..sources.tablestore import TableStore

    store = TableStore(ranks.sparkSession, checkpoint_dir)
    loc = store.write_table(ranks.select("id", "score"), f"iter{iteration:04d}")
    store.write_manifest({
        "iteration": iteration,
        "final": final,
        "ranks_path": loc,
        "backend": store.backend,
        "metrics": [vars(m) for m in metrics],
        "partition_lineage": [list(t) for t in (part_lineage or [])],
    })


def load_snapshot(
    spark: SparkSession, checkpoint_dir: str
) -> tuple[int, dict] | None:
    from ..sources.tablestore import TableStore

    manifest = TableStore(spark, checkpoint_dir).read_manifest()
    if manifest is None:
        return None
    return manifest["iteration"], manifest


def resume_pagerank(
    spark: SparkSession, edges: DataFrame, checkpoint_dir: str, **kwargs
) -> PageRankResult:
    """Continue a checkpointed run from its latest snapshot (bit-compatible:
    the resumed trajectory is the same fixpoint iteration, so final scores
    agree with an uninterrupted run to within the convergence tolerance)."""
    from ..sources.tablestore import TableStore

    snap = load_snapshot(spark, checkpoint_dir)
    if snap is None:
        return pagerank(spark, edges, checkpoint_dir=checkpoint_dir, **kwargs)
    iteration, manifest = snap
    store = TableStore(spark, checkpoint_dir, backend=manifest.get("backend"))
    ranks = store.read_table(manifest["ranks_path"])
    prior = [IterationMetrics(**m) for m in manifest["metrics"]]
    return pagerank(
        spark,
        edges,
        checkpoint_dir=checkpoint_dir,
        start_iteration=iteration,
        start_ranks=ranks,
        prior_metrics=prior,
        **kwargs,
    )


def personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | list,
    alpha: float = ALPHA,
    tol: float = DEFAULT_TOL,
    max_iter: int = 100,
    num_partitions: int | None = None,
) -> PageRankResult:
    """Personalized (topic-sensitive) PageRank: both the teleport and the
    dangling-mass redistribution target the ``sources`` set uniformly
    instead of all vertices —

        r' = α·t + (1-α)(Pᵀ r + missing·t),  t = 1/|S| on S, else 0

    Same execution shape as ``pagerank`` (one observe-fused job per
    iteration, edge table partitioned once); total mass stays 1 because
    all leaked mass returns to S. ``sources`` may be a DataFrame with an
    ``id`` column or a list of vertex ids; ids not present in the graph
    are ignored (at least one must remain)."""
    if isinstance(sources, (list, tuple, set)):
        sources = spark.createDataFrame(
            [(int(s),) for s in sources], "id long"
        )
    if num_partitions is None:
        num_partitions = default_partitions(spark, edges)

    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _ppr_loop(
            spark, edges, sources, alpha, tol, max_iter, num_partitions
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)


def _ppr_loop(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    alpha: float,
    tol: float,
    max_iter: int,
    num_partitions: int,
) -> PageRankResult:
    from pyspark.sql import Observation

    verts = vertices(edges)
    deg = out_degrees(edges)
    src_flag = sources.select("id").distinct().withColumn(
        "is_src", F.lit(True)
    )
    base = (
        verts.join(deg, "id", "left")
        .join(src_flag, "id", "left")
        .select(
            "id",
            F.col("out_degree").isNull().alias("dangling"),
            F.coalesce("is_src", F.lit(False)).alias("is_src"),
        )
        .repartition(num_partitions, "id")
        .persist()
    )
    s_cnt = base.where(F.col("is_src")).count()
    if s_cnt == 0:
        raise ValueError("personalized_pagerank: no source id is in the graph")
    base = base.withColumn(
        "tp", F.when(F.col("is_src"), F.lit(1.0 / s_cnt)).otherwise(F.lit(0.0))
    ).drop("is_src")
    contribs = contributions_table(edges, num_partitions).persist()
    n_edges = contribs.count()

    ranks = base.withColumn("score", F.col("tp")).localCheckpoint(eager=True)
    missing = (
        ranks.where(F.col("dangling")).agg(F.sum("score").alias("m")).first()["m"]
        or 0.0
    )

    metrics: list[IterationMetrics] = []
    converged = False
    it = 0
    while it < max_iter:
        t0 = time.monotonic()
        recv = (
            contribs.join(ranks.select("id", "score"),
                          contribs[SRC] == F.col("id"), "inner")
            .select(F.col(DST), (F.col("score") * F.col("weight")).alias("mass"))
            .groupBy(DST)
            .agg(F.sum("mass").alias("recv"))
        )
        new_score = F.lit(alpha) * F.col("tp") + F.lit(1.0 - alpha) * (
            F.coalesce(F.col("recv"), F.lit(0.0))
            + F.lit(missing) * F.col("tp")
        )
        obs = Observation(f"ppr_iter_{it}")
        new_ranks = (
            ranks.join(recv, ranks["id"] == recv[DST], "left")
            .select(
                "id", "dangling", "tp",
                new_score.alias("score"),
                F.col("score").alias("old_score"),
            )
            .observe(
                obs,
                F.sum(F.abs(F.col("score") - F.col("old_score"))).alias("delta"),
                F.sum("score").alias("total"),
                F.sum(
                    F.when(F.col("dangling"), F.col("score")).otherwise(0.0)
                ).alias("dm"),
            )
            .localCheckpoint(eager=True)
        )
        agg = obs.get
        delta, total = float(agg["delta"]), float(agg["total"])
        it += 1
        metrics.append(
            IterationMetrics(
                iteration=it, delta_l1=delta, total_mass=total,
                missing_mass=missing, edges_processed=n_edges,
                num_partitions=num_partitions,
                wall_sec=time.monotonic() - t0,
            )
        )
        ranks = new_ranks.select("id", "dangling", "tp", "score")
        missing = float(agg["dm"])
        if delta <= tol:
            converged = True
            break

    base.unpersist()
    contribs.unpersist()
    return PageRankResult(ranks.select("id", "score"), it, converged, metrics)


def checksum(ranks: DataFrame, digits: int = 2) -> float:
    """Σ scores rounded — the reference's CheckSumPageRank.java:44-55 report
    (there: Σ exp(log-score) with %.2f through a single reducer)."""
    total = ranks.agg(F.sum("score").alias("s")).first()["s"]
    return round(float(total), digits)


def top_k(ranks: DataFrame, k: int = 100) -> DataFrame:
    """Bounded top-k: Catalyst plans TakeOrderedAndProject — exactly the
    reference's per-mapper heap + single-reducer merge
    (FindMaxPageRankNodes.java:32-95, TopScoredObjects.java:10-62).
    Tie-break: equal scores → ascending id (TopScoredObjects.java:19-29).
    """
    return ranks.orderBy(F.desc("score"), F.asc("id")).limit(k)


def warm_start_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    prior_ranks: DataFrame,
    **kwargs,
) -> PageRankResult:
    """Incremental PageRank for an EVOLVED graph (the daily-crawl path:
    yesterday's converged scores + today's edge table).

    The fixpoint does not depend on the starting vector, only the
    iteration count does — so we project yesterday's scores onto today's
    vertex set (new vertices start at 1/N, departed vertices drop out),
    renormalize total mass to exactly 1 (the §2.12 invariant the loop's
    checksum asserts), and hand the result to ``pagerank(start_ranks=…)``.
    For small daily deltas this converges in a handful of iterations
    instead of tens — the re-crawl cost becomes proportional to how much
    the graph actually moved.
    """
    from .edges import vertices

    verts = vertices(edges)
    n = verts.count()
    aligned = (
        verts.join(
            prior_ranks.select("id", F.col("score").alias("prior")), "id", "left"
        )
        .select("id", F.coalesce(F.col("prior"), F.lit(1.0 / n)).alias("score"))
    )
    total = aligned.agg(F.sum("score")).collect()[0][0]
    start = aligned.select("id", (F.col("score") / F.lit(float(total))).alias("score"))
    return pagerank(spark, edges, start_ranks=start, **kwargs)
