"""Edge-table construction and graph-shape derivations.

Reference semantics being re-expressed (SURVEY.md §2):
- edge dedup via group-by + HashSet (BuildTextGraph.java:82-113)  → ``distinct()``
- blacklist filter on the literal ``unknown`` address
  (BuildTextGraph.java:50,71-77)                                  → ``filter``
- dst-only ("remaining") vertex discovery via a modified left-outer
  join that keeps only right-null rows, i.e. a left-anti join
  (PrepareRemainingNodesJoin.java:151-167)                         → ``left_anti``
- distinct out-addresses (PrepareDistinctOutAddresses.java:45-72)  → ``distinct``

Everything here is declarative Catalyst (column pruning + predicate
pushdown are free); the only shuffles are the ones the semantics force
(distinct on the edge pair, groupBy for degrees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SRC = "src_id"
DST = "dst_id"


def dedup_edges(edges: DataFrame, drop_self_loops: bool = True) -> DataFrame:
    """Deduplicate parallel edges; optionally drop self-loops.

    Analog of the HashSet dedup in BuildTextGraph.java:92-103, done
    *before* adjacency assembly so downstream operators see a simple graph.
    """
    out = edges.select(SRC, DST).where(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
    if drop_self_loops:
        out = out.where(F.col(SRC) != F.col(DST))
    return out.distinct()


def vertices(edges: DataFrame) -> DataFrame:
    """All vertex ids appearing as src or dst → one column ``id``."""
    return (
        edges.select(F.col(SRC).alias("id"))
        .unionByName(edges.select(F.col(DST).alias("id")))
        .distinct()
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree) for vertices with at least one out-edge."""
    return edges.groupBy(F.col(SRC).alias("id")).agg(F.count("*").alias("out_degree"))


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col(DST).alias("id")).agg(F.count("*").alias("in_degree"))


def dangling_vertices(edges: DataFrame) -> DataFrame:
    """Vertices that appear only as destinations (graph sinks).

    Reference: PrepareRemainingNodesJoin.java:151-167 — a left-outer join
    deliberately modified to emit only rows with an empty right list,
    which is exactly a left-anti join.
    """
    dsts = edges.select(F.col(DST).alias("id")).distinct()
    srcs = edges.select(F.col(SRC).alias("id")).distinct()
    return dsts.join(srcs, "id", "left_anti")


def undirected_view(edges: DataFrame) -> DataFrame:
    """Symmetric closure with dedup — input to CC / LPA / triangles."""
    sym = edges.select(SRC, DST).unionByName(
        edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )
    return sym.where(F.col(SRC) != F.col(DST)).distinct()


def contributions_table(
    edges: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Per-edge PageRank weight table: (src_id, dst_id, weight=1/out_degree).

    Precomputed once per PageRank run (the reference recomputes ``p - log d``
    per message per iteration, RunPageRankBasic.java:79-88). Partitioned by
    ``src_id`` so the per-iteration score join co-locates without
    re-shuffling the (large) edge side.
    """
    deg = out_degrees(edges)
    contrib = edges.join(deg, edges[SRC] == deg["id"], "inner").select(
        F.col(SRC),
        F.col(DST),
        (F.lit(1.0) / F.col("out_degree").cast("double")).alias("weight"),
    )
    if num_partitions:
        contrib = contrib.repartition(num_partitions, SRC)
    return contrib
