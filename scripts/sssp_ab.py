"""Interleaved A/B: frontier-limited vs full-table SSSP relaxation.

Evidence for the round-4 SSSP rewrite (operators/sssp.py): the old loop
joined ALL settled vertices against the edge table every round (k rounds
cost k*|E| join work); the new loop pushes only the frontier (vertices
improved in the previous round), semantics-identical for Bellman-Ford.
This script runs both variants INTERLEAVED in one JVM (the only
regression-proof protocol on this time-shared host, per BENCH.md) on the
2M-vertex arithmetic stress graph and prints per-variant walls plus the
per-round relaxed-edge counts that explain the delta.

Usage: python scripts/sssp_ab.py [vertices] [rounds] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Observation, functions as F  # noqa: E402

from bitcoinpagerank_spark.session import get_spark  # noqa: E402
from bitcoinpagerank_spark.operators.sssp import sssp  # noqa: E402
from scripts.scaling_bench import synth_edges  # noqa: E402


def full_relax_sssp(spark, e, source, max_rounds):
    """The pre-round-4 loop: every settled vertex relaxes every round."""
    dist = spark.createDataFrame(
        [(int(source), 0.0)], "id long, dist double"
    ).localCheckpoint(eager=True)
    relaxed_per_round = []
    for r in range(max_rounds):
        obs = Observation(f"ab_full_{time.monotonic_ns()}_{r}")
        cand = (
            e.join(dist.select(F.col("id").alias("src_id"), "dist"), "src_id")
            .select(F.col("dst_id").alias("id"),
                    (F.col("dist") + F.col("w")).alias("cand"))
        )
        relaxed = cand.groupBy("id").agg(F.min("cand").alias("cand"))
        merged = (
            dist.join(relaxed, "id", "full_outer")
            .select(
                "id",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
                .cast("int").alias("improved"),
            )
            .observe(obs, F.sum("improved").alias("n_improved"),
                     F.count(F.lit(1)).alias("n_rows"))
            .localCheckpoint(eager=True)
        )
        improved = int(obs.get["n_improved"] or 0)
        relaxed_per_round.append(improved)
        dist = merged.select("id", "dist")
        if improved == 0:
            break
    return dist, r + 1


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cores = 16
    spark = get_spark(app_name="sssp_ab", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    e = (
        synth_edges(spark, n, cores)
        .withColumn("w", (F.col("src_id") + F.col("dst_id")) % 7 + 1)
        .persist()
    )
    n_edges = e.count()
    # warmup both paths once
    sssp(spark, e, source=1, weight_col="w", max_rounds=2,
         num_partitions=cores)
    full_relax_sssp(spark, e, 1, 2)

    walls = {"frontier": [], "full": []}
    for rep in range(reps):
        t0 = time.monotonic()
        res = sssp(spark, e, source=1, weight_col="w", max_rounds=rounds,
                   num_partitions=cores)
        walls["frontier"].append(time.monotonic() - t0)
        t0 = time.monotonic()
        _, fr = full_relax_sssp(spark, e, 1, rounds)
        walls["full"].append(time.monotonic() - t0)
        if rep == 0:
            nrows = res.distances.count()
            print(f"graph: {n} vertices, {n_edges} edges; reached {nrows}; "
                  f"rounds frontier={res.rounds} full={fr}")
            print("frontier relaxed-edges/round:",
                  [m["relaxed_edges"] for m in res.metrics])
    fw, lw = min(walls["frontier"]), min(walls["full"])
    print(f"frontier: {fw:.1f}s  full-relax: {lw:.1f}s  "
          f"speedup x{lw / fw:.2f}  (min of {reps} interleaved reps)")


if __name__ == "__main__":
    main()
