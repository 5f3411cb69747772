"""Weakly-connected components via iterative-min label exchange.

The reference computes component counts only in its sequential JUNG oracle
(SequentialPageRank.java:65-68, ``WeakComponentClusterer``); the north_rule
promotes WCC to a first-class distributed operator: per iteration every
vertex adopts the minimum label among itself and its neighbors (undirected
view), until no label changes. Component label = min vertex id — matching
a union-find oracle exactly.

Scale shape: the (large, static) undirected edge table is hash-partitioned
by src once and reused every iteration; only the (small) labels table
re-shuffles. Label exchange is one join + min-aggregate — map-side partial
aggregation caps shuffle volume at one row per (dst, partition).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import SRC, DST, undirected_view, vertices


@dataclass
class ComponentsResult:
    labels: DataFrame  # (id: long, component: long)
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)

    def num_components(self) -> int:
        return self.labels.select("component").distinct().count()


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 50,
    num_partitions: int | None = None,
) -> ComponentsResult:
    if num_partitions is None:
        from .edges import auto_partitions

        num_partitions = auto_partitions(spark, edges.count())

    und = undirected_view(edges).repartition(num_partitions, SRC).persist()
    und.count()
    labels = (
        vertices(edges)
        .withColumn("component", F.col("id"))
        .repartition(num_partitions, "id")
        .localCheckpoint(eager=True)
    )

    converged = False
    it = 0
    metrics: list[dict] = []
    while it < max_iter:
        t0 = time.monotonic()
        nbr_min = (
            und.join(labels, und[SRC] == labels["id"], "inner")
            .groupBy(DST)
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min[DST], "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.join(
                labels.select("id", F.col("component").alias("old")), "id"
            )
            .where(F.col("component") != F.col("old"))
            .count()
        )
        it += 1
        metrics.append(
            {"iteration": it, "changed": changed,
             "wall_sec": time.monotonic() - t0}
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    und.unpersist()
    return ComponentsResult(labels, it, converged, metrics)
