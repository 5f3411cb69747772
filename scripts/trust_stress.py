"""Trust-family scale stress (judge r5 Next #5): spam_mass (= full
PageRank + TrustRank + ratio join) on an R-MAT-21 graph (2.1M vertices,
~16M generated edges — the same skew law as a real web crawl), fixed
iteration budget so the measured work is deterministic.

Sanity gates: both rank vectors checksum to ~1 mass accounting, the
spam-mass distribution is reported (spam candidates = high PR, zero
trust inflow), and the top-k by spam_mass is deterministic.

Usage: python scripts/trust_stress.py [scale=21] [iters=8]
Emits one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bitcoinpagerank_spark.operators.trust import spam_mass
from bitcoinpagerank_spark.session import get_spark
from bitcoinpagerank_spark.sources.rmat import rmat_edges


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="trust-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    edges = rmat_edges(spark, scale=scale, num_partitions=cpus).persist()
    n_edges = edges.count()
    n_verts = (
        edges.select(F.col("src_id").alias("id"))
        .unionByName(edges.select(F.col("dst_id").alias("id")))
        .distinct()
        .count()
    )
    # seed set: 50 hub pages by out-degree (deterministic tie-break)
    seeds = [
        r["id"]
        for r in edges.groupBy(F.col("src_id").alias("id"))
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), F.asc("id"))
        .limit(50)
        .collect()
    ]

    t0 = time.monotonic()
    sm = spam_mass(spark, edges, seeds, tol=0.0, max_iter=iters)
    sm = sm.persist()
    n_rows = sm.count()
    wall = time.monotonic() - t0

    agg = sm.agg(
        F.round(F.sum("pagerank"), 6).alias("pr_mass"),
        F.round(F.sum("trustrank"), 6).alias("tr_mass"),
        F.round(F.avg("spam_mass"), 4).alias("avg_sm"),
        F.sum(F.when(F.col("spam_mass") > 0.99, 1).otherwise(0)).alias(
            "n_untrusted"
        ),
    ).collect()[0]
    top = [
        r["id"]
        for r in sm.orderBy(F.desc("spam_mass"), F.desc("pagerank"), F.asc("id"))
        .limit(5)
        .collect()
    ]
    print(
        json.dumps(
            {
                "summary": "trust_stress",
                "scale": scale,
                "n_vertices": n_verts,
                "n_edges": n_edges,
                "iterations_each": iters,
                "wall_sec": round(wall, 2),
                "edge_iters_per_sec": round(n_edges * iters * 2 / wall, 1),
                "pr_mass": float(agg["pr_mass"]),
                "tr_mass": float(agg["tr_mass"]),
                "avg_spam_mass": float(agg["avg_sm"]),
                "n_untrusted_sm_gt_099": int(agg["n_untrusted"]),
                "top5_spam_ids": top,
                "cpus": cpus,
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
