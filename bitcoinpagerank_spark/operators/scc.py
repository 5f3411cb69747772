"""Strongly connected components via forward-backward min-label peeling.

Not in the reference (link-graph breadth; the reference's graph jobs are
all undirected-or-flow style). Algorithm (FW-BW coloring, the standard
distributed SCC shape):

  repeat until no vertices remain:
    TRIM: iteratively peel vertices with zero in-degree or zero
    out-degree in the remaining subgraph — each is a singleton SCC (a
    vertex with no incoming edge cannot lie on a cycle), and removing
    one can expose the next, so the peel cascades to a fixpoint. This
    is the standard FW-BW-Trim pre-pass: on crawl frontiers most
    vertices are trivial SCCs and never pay for a closure round.
    f(v) = min vertex id that can REACH v   (forward min-label closure)
    b(v) = min vertex id v can reach        (backward closure)
    every v with f(v) == b(v) is settled: its SCC id is that label
    (f(v) == b(v) == m means v and m reach each other, and every vertex
    of SCC(m) shares the pair, so whole SCCs settle atomically)
    drop settled vertices and their edges

Each closure is iterative min-label propagation along edge direction —
O(directed diameter) rounds, one job per round (convergence signature
observe()-fused on the eager localCheckpoint, the components.py
pattern). Star-contraction tricks do not apply to DIRECTED reachability
(they merge across undirected paths), and pointer-doubling squares the
edge set; plain propagation is the scale-sane default. Outer rounds:
each settles at least every reach-minimal SCC — 2 rounds on the doc
graph; worst case (a condensation chain) is O(#SCCs), bounded by
``max_rounds``.

Oracle: DuckDB mutual-reachability closure (catalog g_scc) + Tarjan in
tests/oracles.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .edges import SRC, DST
from .lineage import eager_checkpoint, group_shuffle_bytes, job_group, next_group


@dataclass
class SccResult:
    labels: DataFrame  # (id, scc) — scc = min vertex id of the component
    rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _min_label_closure(
    spark: SparkSession,
    edges: DataFrame,
    verts: DataFrame,
    tag: str,
    max_iter: int,
    metrics: list[dict],
) -> DataFrame:
    """Fixpoint of lab(v) = min(lab(v), min over in-neighbors u of
    lab(u)) starting from lab(v) = v; one job per propagation round."""
    lab = verts.select("id", F.col("id").alias("lab")).localCheckpoint(eager=True)
    for it in range(max_iter):
        t0 = time.monotonic()
        pushed = (
            edges.join(lab.select(F.col("id").alias(SRC), "lab"), SRC)
            .groupBy(F.col(DST).alias("id"))
            .agg(F.min("lab").alias("in_min"))
        )
        obs = Observation(f"scc_{tag}_{it}")
        grp = next_group(f"scc_{tag}", it)
        with job_group(spark, grp, f"SCC {tag} closure round"):
            new_lab = (
                lab.join(pushed, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("lab"), F.coalesce(F.col("in_min"), F.col("lab"))
                    ).alias("lab"),
                    F.col("lab").alias("old"),
                )
                .observe(
                    obs,
                    F.sum((F.col("lab") != F.col("old")).cast("long")).alias(
                        "changed"
                    ),
                )
            )
            # stats-resetting checkpoint: the closure round references the
            # previous label checkpoint twice (join + merge), compounding
            # the carried size estimate x2/round
            new_lab = eager_checkpoint(new_lab)
            changed = int(obs.get["changed"] or 0)
        srb, swb = group_shuffle_bytes(spark, grp)
        metrics.append(
            {"closure": tag, "iteration": it + 1, "changed": changed,
             "wall_sec": time.monotonic() - t0,
             "shuffle_read_bytes": srb, "shuffle_write_bytes": swb}
        )
        lab = new_lab.select("id", "lab")
        if changed == 0:
            break
    return lab


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 50,
    max_closure_iter: int = 200,
    num_partitions: int | None = None,
    trim: bool = True,
) -> SccResult:
    """``trim=False`` disables the FW-BW-Trim pre-pass (closure-only, the
    pre-r4 behavior) — kept selectable for A/B measurement; trim is
    strictly work-saving on graphs with trivial SCCs."""
    if num_partitions is None:
        from .edges import default_partitions

        num_partitions = default_partitions(spark, edges)

    e = (
        edges.select(SRC, DST)
        .where(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
        .where(F.col(SRC) != F.col(DST))
        .distinct()
        .repartition(num_partitions, SRC)
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col(SRC).alias("id"))
        .unionByName(e.select(F.col(DST).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    settled_frames: list[DataFrame] = []
    metrics: list[dict] = []
    converged = False
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # FW-BW-Trim: cascade-peel trivial SCCs before paying for closures
        trim_it = 0
        while trim:
            trim_it += 1
            t0 = time.monotonic()
            both = eager_checkpoint(
                e.select(F.col(SRC).alias("id")).distinct()
                .join(e.select(F.col(DST).alias("id")).distinct(), "id")
            )
            # count first, checkpoint the peeled set only when non-empty:
            # on trivial-free graphs (dense cores) each trim check costs
            # one job, not a wasted checkpoint + job
            n_trivial = verts.join(both, "id", "left_anti").count()
            metrics.append(
                {"closure": f"trim{rounds}", "iteration": trim_it,
                 "changed": n_trivial, "wall_sec": time.monotonic() - t0,
                 "shuffle_read_bytes": 0, "shuffle_write_bytes": 0}
            )
            if n_trivial == 0:
                break
            trivial = verts.join(both, "id", "left_anti").localCheckpoint(
                eager=True
            )
            settled_frames.append(
                trivial.select("id", F.col("id").alias("scc"))
            )
            verts = both
            e = eager_checkpoint(
                e.join(both.withColumnRenamed("id", SRC), SRC, "left_semi")
                .join(both.withColumnRenamed("id", DST), DST, "left_semi")
            )
        if verts.isEmpty():
            converged = True
            break
        rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        f = _min_label_closure(spark, e, verts, f"fwd{rounds}", max_closure_iter, metrics)
        b = _min_label_closure(spark, rev, verts, f"bwd{rounds}", max_closure_iter, metrics)
        joined = f.join(
            b.select(F.col("id").alias("bid"), F.col("lab").alias("blab")),
            F.col("id") == F.col("bid"),
        ).select("id", "lab", "blab")
        settled = (
            joined.where(F.col("lab") == F.col("blab"))
            .select("id", F.col("lab").alias("scc"))
            .localCheckpoint(eager=True)
        )
        settled_frames.append(settled)
        remaining = (
            joined.where(F.col("lab") != F.col("blab"))
            .select("id")
            .localCheckpoint(eager=True)
        )
        if remaining.isEmpty():
            converged = True
            break
        verts = remaining
        e = eager_checkpoint(
            e.join(remaining.withColumnRenamed("id", SRC), SRC, "left_semi")
            .join(remaining.withColumnRenamed("id", DST), DST, "left_semi")
        )
    if settled_frames:
        out = settled_frames[0]
        for frame in settled_frames[1:]:
            out = out.unionByName(frame)
    else:  # empty graph: trim had nothing and no closure ever ran
        out = spark.createDataFrame([], "id long, scc long")
    return SccResult(out, rounds, converged, metrics)
