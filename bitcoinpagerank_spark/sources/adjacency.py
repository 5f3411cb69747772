"""Whitespace adjacency-text scan — the reference's graph input format.

Parses the shape of /root/reference/data/p2p-Gnutella08-adj.txt (one line
per vertex: ``src[\\t ]dst1[\\t ]dst2...``; a bare ``src`` line declares a
vertex with no out-links — how the reference's remaining-nodes step
materializes sinks, BuildTextGraph.java:194-208). The reference parser is
BuildPageRankRecords.MyMapper (BuildPageRankRecords.java:49-90); ours is a
declarative split/explode so the scan stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_adjacency_text(spark: SparkSession, path: str) -> DataFrame:
    """Returns edges(src_id, dst_id). Sink-only lines contribute no edges
    (their vertices reappear via dst occurrences elsewhere, or can be
    recovered with ``adjacency_vertices``)."""
    lines = spark.read.text(path)
    toks = lines.select(F.split(F.trim(F.col("value")), r"\s+").alias("t")).where(
        F.size("t") > 0
    )
    return (
        toks.select(
            F.element_at("t", 1).cast("long").alias("src_id"),
            F.explode(F.slice("t", 2, 2_147_483_647)).alias("dst"),
        )
        .select("src_id", F.col("dst").cast("long").alias("dst_id"))
        .where(F.col("src_id").isNotNull() & F.col("dst_id").isNotNull())
    )


def adjacency_vertices(spark: SparkSession, path: str) -> DataFrame:
    """All declared vertices, including bare sink lines → (id)."""
    lines = spark.read.text(path)
    toks = lines.select(F.split(F.trim(F.col("value")), r"\s+").alias("t")).where(
        F.size("t") > 0
    )
    return (
        toks.select(F.element_at("t", 1).cast("long").alias("id"))
        .where(F.col("id").isNotNull())
        .distinct()
    )
