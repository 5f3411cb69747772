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
        from .edges import default_partitions

        num_partitions = default_partitions(spark, edges)

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


def biased_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int = 4,
    w_return: int = 1,
    w_common: int = 2,
    w_far: int = 4,
    num_partitions: int | None = None,
) -> WalkResult:
    """node2vec-style second-order walks, deterministically pseudo-random.

    At each step the next hop is drawn from the current vertex's
    out-neighbors with INTEGER weights by their relation to the previous
    vertex: ``w_return`` for going back (node2vec 1/p), ``w_common`` for
    neighbors the previous vertex also links to (distance-1), ``w_far``
    for the rest (1/q) — integer weights keep the cumulative-sum draw
    exact int64 arithmetic, so the DuckDB oracle replays identical
    walks. Step 1 has no previous vertex and is the uniform first-order
    choice.

    Unlike the first-order walk (indexed O(1) choice per step), the
    biased step must ENUMERATE the frontier vertex's neighbors to weight
    them (as every node2vec implementation does): per step that is one
    adjacency fan-out join + a (prev, candidate)∈E membership join + two
    walk-partitioned window sums — all Catalyst, no Python, state one
    row per (walk, neighbor-candidate) within the step.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if min(w_return, w_common, w_far) < 0 or max(w_return, w_common, w_far) == 0:
        raise ValueError("weights must be non-negative and not all zero")
    if num_partitions is None:
        from .edges import default_partitions

        num_partitions = default_partitions(spark, edges)

    adj = indexed_adjacency(edges).repartition(num_partitions, SRC)
    adj = adj.localCheckpoint(eager=True)
    deg = (
        adj.groupBy(F.col(SRC).alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    ).localCheckpoint(eager=True)
    epairs = adj.select(F.col(SRC).alias("p_src"), F.col(DST).alias("p_dst"))

    verts = (
        adj.select(F.col(SRC).alias("id"))
        .unionByName(adj.select(F.col(DST).alias("id")))
        .distinct()
    )
    starts = (
        verts.select(F.col("id").alias("walk_id"), F.col("id").alias("pos"))
        # cut lineage back to adj: the step-1 join below re-joins adj, and
        # a shared scan would make adj's columns ambiguous (self-join)
        .localCheckpoint(eager=True)
    )
    frames = [starts.select("walk_id", F.lit(0).alias("step"), "pos")]

    # step 1: uniform indexed choice (no prev)
    first = (
        starts.join(deg, starts["pos"] == deg["v"], "inner")
        .select(
            "walk_id",
            "pos",
            F.pmod(_step_hash(F.col("walk_id"), 1), F.col("deg")).alias("choice"),
        )
    )
    frontier = (
        first.join(
            adj,
            (first["pos"] == adj[SRC]) & (first["choice"] == adj["idx"]),
            "inner",
        )
        .select("walk_id", first["pos"].alias("prev"), adj[DST].alias("pos"))
        .localCheckpoint(eager=True)
    )
    frames.append(frontier.select("walk_id", F.lit(1).alias("step"), "pos"))

    for step in range(2, walk_length + 1):
        cand = frontier.join(adj, frontier["pos"] == adj[SRC], "inner").select(
            "walk_id", "prev", frontier["pos"].alias("cur"),
            adj["idx"].alias("idx"), adj[DST].alias("nxt"),
        )
        cand = cand.join(
            epairs,
            (cand["prev"] == epairs["p_src"]) & (cand["nxt"] == epairs["p_dst"]),
            "left",
        ).select(
            "walk_id", "prev", "cur", "idx", "nxt",
            F.when(F.col("nxt") == F.col("prev"), F.lit(w_return))
            .when(F.col("p_src").isNotNull(), F.lit(w_common))
            .otherwise(F.lit(w_far))
            .alias("w"),
        )
        wo = Window.partitionBy("walk_id").orderBy("idx")
        wt = Window.partitionBy("walk_id")
        cand = (
            cand.withColumn("cum", F.sum("w").over(wo) - F.col("w"))
            .withColumn("tot", F.sum("w").over(wt))
            .withColumn(
                "r", F.pmod(_step_hash(F.col("walk_id"), step), F.col("tot"))
            )
        )
        nxt = cand.where(
            (F.col("cum") <= F.col("r")) & (F.col("r") < F.col("cum") + F.col("w"))
        ).select("walk_id", F.col("cur").alias("prev"), F.col("nxt").alias("pos"))
        frontier = nxt.localCheckpoint(eager=True)
        frames.append(frontier.select("walk_id", F.lit(step).alias("step"), "pos"))

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return WalkResult(out, walk_length, 1)


def skipgram_pairs(steps: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, offset) training pairs from a walk corpus — the
    word2vec/node2vec skip-gram extraction: for every walk, each pair of
    positions at step distance 1..``window`` (both directions, signed
    ``offset``). One self-equi-join on walk_id with a banded step
    predicate; pairs per walk = O(length·window), independent of graph
    degree."""
    if window < 1:
        raise ValueError("window must be >= 1")
    a = steps.select("walk_id", F.col("step").alias("a_step"), F.col("pos").alias("center"))
    b = steps.select("walk_id", F.col("step").alias("b_step"), F.col("pos").alias("context"))
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("b_step") != F.col("a_step"))
            & (F.abs(F.col("b_step") - F.col("a_step")) <= window)
        )
        .select(
            "center",
            "context",
            (F.col("b_step") - F.col("a_step")).cast("long").alias("offset"),
        )
    )


NEG_A = 2_654_435_761  # Knuth multiplicative-hash constant (fits int64 ops)
NEG_B = 40_503
NEG_C = 97
NEG_P31 = 2_147_483_647  # pre-reduction modulus: rank%P31 · NEG_A < 2^63


def skipgram_negatives(
    spark,
    edges: DataFrame,
    k: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """(center, j, neg) — k deterministic negative samples per vertex for
    skip-gram training. The draw runs over a DENSE vertex rank (0..n−1,
    by ascending id), not the raw id space: with sparse/hashed 64-bit ids
    a raw-id draw mostly misses the vertex set (silently yielding fewer
    than k — often 0 — negatives), and center·NEG_A overflows int64.
    Here every draw lands on a real vertex, so each vertex gets EXACTLY
    k negatives, and the pre-reduction rank % 2^31−1 keeps the product
    under 2^63 for any graph size. (The standard word2vec scheme does not
    exclude true neighbors — collision probability is degree/|V| ≈ 0;
    the LCG makes the sample oracle-replayable, rand() would not be.)

    Plan: the dense rank reuses the range-partitioned dictionary shape
    (functions/text.py:token_dictionary) — NO single-partition global
    window: range-partition by id, one P-row count job → cumulative
    offsets broadcast back, rank = offset + per-partition row_number.
    Then one sequence()+explode fan-out (k rows per vertex) + one
    rank-keyed equi-join back to ids."""
    from pyspark.sql import Window

    from .edges import vertices

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = vertices(edges)
    # freeze the range partitioning (repartitionByRange samples bounds)
    ranged = (
        verts.repartitionByRange(num_partitions, "id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["pid"]: r["c"]
        for r in ranged.groupBy("pid").agg(F.count("*").alias("c")).collect()
    }
    n = sum(counts.values())
    if n == 0:
        raise ValueError("negative sampling on an empty graph")
    offsets, acc = [], 0
    for pid in range(num_partitions):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    offsets_df = spark.createDataFrame(offsets, "pid int, off long")
    w = Window.partitionBy("pid").orderBy("id")
    ranked = ranged.join(F.broadcast(offsets_df), "pid").select(
        "id",
        (F.col("off") + F.row_number().over(w) - 1).cast("long").alias("rank"),
    )
    cand = ranked.select(
        F.col("id").alias("center"),
        "rank",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(k - 1).cast("long"))
        ).alias("j"),
    ).select(
        "center",
        "j",
        (
            ((F.col("rank") % NEG_P31) * NEG_A + F.col("j") * NEG_B + NEG_C) % n
        ).alias("draw"),
    )
    return cand.join(
        ranked.select(F.col("rank").alias("draw"), F.col("id").alias("neg")),
        "draw",
    ).select("center", "j", "neg")
