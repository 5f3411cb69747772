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


def write_adjacency_text(edges: DataFrame, path: str) -> None:
    """Write edges back out in the reference's adjacency-text format:
    one ``src<TAB>dst1<TAB>dst2...`` line per source (BuildTextGraph's
    output shape, BuildTextGraph.java:104-110), plus a bare ``id`` line
    for every sink-only vertex (the copyMerge'd remaining-nodes file,
    BuildTextGraph.java:194-208). Neighbor order is sorted — the
    reference's HashSet order is JVM-dependent; sorted is deterministic
    and parses identically.

    One groupBy(src) shuffle + one left-anti for sinks; the whole line
    is built with array/concat expressions (no Python)."""
    srcs = edges.groupBy(F.col("src_id").alias("id")).agg(
        F.sort_array(F.collect_set("dst_id")).alias("dsts")
    )
    sinks = (
        edges.select(F.col("dst_id").alias("id"))
        .distinct()
        .join(edges.select(F.col("src_id").alias("id")).distinct(), "id", "left_anti")
        .withColumn("dsts", F.array().cast("array<long>"))
    )
    lines = srcs.unionByName(sinks).select(
        F.concat_ws(
            "\t",
            F.col("id").cast("string"),
            F.concat_ws("\t", F.transform("dsts", lambda d: d.cast("string"))),
        ).alias("value")
    ).select(F.regexp_replace("value", "\t$", "").alias("value"))
    lines.write.mode("overwrite").text(path)
