"""Louvain-style greedy modularity moves (one synchronous phase).

Not in the reference; community-detection breadth next to label
propagation (`labelprop.py`) and the host-partition modularity score
(`g_host_modularity`). This implements the Louvain algorithm's MOVE
PHASE from the singleton partition, synchronously: every vertex i
evaluates, for each neighbor community c, the modularity gain

    ΔQ(i→c) = ( k_{i,c} − k_i·Σ_c / (2m) ) / m

and adopts the argmax if the gain is positive. From singletons each
neighbor community is a single vertex j with Σ_c = k_j and k_{i,c} = 1,
so the argmax is simply the neighbor with MINIMUM degree (ties → lower
id) and the move fires iff k_i·k_j < 2m — pure integer arithmetic, which
is what makes the round exactly SQL-replayable (full multi-round Louvain
with community re-aggregation follows the same join shapes; the
synchronous variant is the one that parallelizes).

Plan: one degree agg + one neighbor join + one bounded per-vertex
window argmin. Simultaneous moves may chain (i→j while j→k) — standard
for parallel Louvain; the next phase's re-aggregation resolves chains.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .edges import SRC, DST, undirected_view


def louvain_move_round(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """(id, community, moved, delta_q) after one synchronous move phase
    from singletons. ``community`` is the chosen neighbor's id (or the
    vertex's own id when no positive-gain move exists)."""
    sym = undirected_view(edges)
    deg = sym.groupBy(F.col(SRC).alias("id")).agg(F.count(F.lit(1)).alias("k"))
    m_row = sym.agg((F.count(F.lit(1)) / 2).cast("long").alias("m"))
    nbr = (
        sym.join(deg.select(F.col("id").alias(SRC), F.col("k").alias("k_i")), SRC)
        .join(deg.select(F.col("id").alias(DST), F.col("k").alias("k_j")), DST)
        .select(
            F.col(SRC).alias("id"), F.col(DST).alias("j"), "k_i", "k_j"
        )
    )
    w = Window.partitionBy("id").orderBy(F.asc("k_j"), F.asc("j"))
    best = (
        nbr.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .crossJoin(F.broadcast(m_row))
    )
    gain = (1.0 - F.col("k_i") * F.col("k_j") / (2.0 * F.col("m"))) / F.col("m")
    return best.select(
        "id",
        F.when(F.col("k_i") * F.col("k_j") < 2 * F.col("m"), F.col("j"))
        .otherwise(F.col("id"))
        .alias("community"),
        (F.col("k_i") * F.col("k_j") < 2 * F.col("m")).alias("moved"),
        F.round(
            F.when(F.col("k_i") * F.col("k_j") < 2 * F.col("m"), gain).otherwise(
                0.0
            ),
            9,
        ).alias("delta_q"),
    )


@dataclass
class LouvainResult:
    communities: DataFrame  # (id, community)
    rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def louvain_communities(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 10,
    num_partitions: int | None = None,
) -> LouvainResult:
    """Single-level synchronous Louvain (move phase to a fixpoint; graph
    contraction composes via ``edges.quotient_graph`` when hierarchy is
    wanted). Per round every vertex i picks, over its neighbor
    communities ∪ its current one, the community maximizing

        score2(i, c) = 2m·k_{i,c} − k_i·Σ'_c        (× 2m of the Q gain)

    with Σ'_c = Σ_c − k_i when c is i's current community (i removed
    before evaluating, the standard Louvain accounting). score2 is pure
    INTEGER arithmetic — argmax ties broken toward staying, then the
    lower community id — so every round is deterministic and exactly
    replayable by the SQL oracle and the pytest python replay.

    Pure synchronous sweeps oscillate (two vertices can swap communities
    forever), so each round only HALF the vertices are move-eligible —
    those with (id + round) % 2 == 0 — the standard parallel-Louvain
    symmetry-breaking (a 2-coloring of the update schedule); the other
    half keeps its community that round. Convergence = two consecutive
    rounds with zero moves (one parity class being quiet does not imply
    the other is). Per round: two hash aggs (community sums, i→community
    edge counts) + one bounded argmax window; move counts ride observe()
    on the round's checkpoint.
    """
    import time

    from pyspark.sql import Observation

    from .edges import auto_partitions
    from .lineage import group_shuffle_bytes, job_group, next_group

    if num_partitions is None:
        num_partitions = auto_partitions(spark, edges.count())
    sym = (
        undirected_view(edges)
        .repartition(num_partitions, SRC)
        .localCheckpoint(eager=True)
    )
    deg = (
        sym.groupBy(F.col(SRC).alias("id"))
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=True)
    )
    m = sym.count() // 2
    comm = deg.select("id", F.col("id").alias("community")).localCheckpoint(
        eager=True
    )
    metrics: list[dict] = []
    converged = False
    rounds = 0
    for r in range(max_rounds):
        t0 = time.monotonic()
        grp = next_group("louvain", r)
        csum = comm.join(deg, "id").groupBy("community").agg(
            F.sum("k").alias("ctot")
        )
        # k_{i,c}: edges from i into each neighbor community
        kic = (
            sym.join(
                comm.select(F.col("id").alias(DST), F.col("community").alias("c")),
                DST,
            )
            .groupBy(F.col(SRC).alias("id"), "c")
            .agg(F.count(F.lit(1)).alias("kic"))
        )
        cur = comm.select("id", F.col("community").alias("cur"))
        # candidate set = neighbor communities ∪ current (kic=0 if absent)
        kc = kic.join(cur, "id")  # (id, c, kic, cur)
        have_cur = kc.where(F.col("c") == F.col("cur")).select("id")
        stay = cur.join(have_cur, "id", "left_anti").select(
            "id",
            F.col("cur").alias("c"),
            F.lit(0).cast("long").alias("kic"),
            "cur",
        )
        cand = kc.unionByName(stay)
        scored = (
            cand.join(deg, "id")
            .join(csum.select(F.col("community").alias("c"), "ctot"), "c")
            .select(
                "id",
                "c",
                "cur",
                (
                    2 * m * F.col("kic")
                    - F.col("k")
                    * (
                        F.col("ctot")
                        - F.when(F.col("c") == F.col("cur"), F.col("k")).otherwise(0)
                    )
                ).alias("score2"),
            )
        )
        w = Window.partitionBy("id").orderBy(
            F.desc("score2"),
            F.when(F.col("c") == F.col("cur"), 0).otherwise(1),
            F.asc("c"),
        )
        obs = Observation(f"louvain_{r}")
        eligible = (F.col("id") + r) % 2 == 0
        with job_group(spark, grp, "Louvain move round"):
            new_comm = (
                scored.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(
                    "id",
                    F.when(eligible, F.col("c"))
                    .otherwise(F.col("cur"))
                    .alias("community"),
                    (eligible & (F.col("c") != F.col("cur")))
                    .cast("int")
                    .alias("moved"),
                )
                .observe(obs, F.sum("moved").alias("n_moved"))
                .localCheckpoint(eager=True)
            )
            n_moved = int(obs.get["n_moved"] or 0)
        comm = new_comm.select("id", "community")
        srb, swb = group_shuffle_bytes(spark, grp)
        rounds = r + 1
        metrics.append(
            {"round": rounds, "moved": n_moved,
             "wall_sec": time.monotonic() - t0,
             "shuffle_read_bytes": srb, "shuffle_write_bytes": swb}
        )
        if n_moved == 0 and r > 0 and metrics[-2]["moved"] == 0:
            converged = True
            break
    return LouvainResult(comm, rounds, converged, metrics)
