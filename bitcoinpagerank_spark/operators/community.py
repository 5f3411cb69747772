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
