"""from_delta vs derive-variant vs cold, one JVM, interleaved (r6
Finding 3 evidence): blocks-shaped graph (32 disjoint R-MAT blocks),
delta confined to 2 blocks, 1% of edges changed. The claim under test:
incremental_components spends three |E|-scale joins REDISCOVERING the
delta; handing the differ's output to incremental_components_from_delta
removes them, leaving delta/dirty-scale analysis + the reduced
recompute.

Usage: python scripts/incr_delta_ab.py [scale=22] [reps=3]
Emits one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bitcoinpagerank_spark.operators.components import (
    connected_components,
    incremental_components,
    incremental_components_from_delta,
)
from bitcoinpagerank_spark.session import get_spark
from bitcoinpagerank_spark.sources.rmat import rmat_edges


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="incr-delta-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    n_blocks, block_scale = 32, scale - 5
    base = rmat_edges(
        spark, scale=block_scale,
        n_edges=16 * (1 << block_scale) * n_blocks,
        seed=7, num_partitions=cpus, dedup=False,
    )
    blk = F.pmod(
        F.xxhash64(F.col("src_id") * 7 + F.col("dst_id")), F.lit(n_blocks)
    )
    off = blk * (1 << block_scale)
    # canonical undirected form (least, greatest) so the script's exact
    # anti-join composition of `today` agrees with from_delta's
    # canonical-pair contract (R-MAT emits both orientations of some
    # pairs; an orientation-sensitive deletion cut would otherwise
    # delete (a,b) while the script's today keeps (b,a))
    shifted = base.select(
        (F.col("src_id") + off).alias("s"), (F.col("dst_id") + off).alias("d")
    )
    prior = (
        shifted.select(
            F.least("s", "d").alias("src_id"),
            F.greatest("s", "d").alias("dst_id"),
        )
        .where(F.col("src_id") != F.col("dst_id"))
        .distinct()
        .persist()
    )
    n_prior = prior.count()
    region = F.greatest("src_id", "dst_id") < (2 << block_scale)
    prior_labels = connected_components(spark, prior).labels.localCheckpoint(
        eager=True
    )

    cut = int(1_000_000 * (n_prior // 200) / max(n_prior, 1))  # ~0.5% dels
    deleted = prior.where(region).where(
        F.pmod(F.xxhash64("src_id", "dst_id"), F.lit(1_000_000)) < cut * 16
    ).persist()
    added = (
        rmat_edges(spark, scale=scale, seed=99, num_partitions=cpus)
        .where(region)
        .join(prior, ["src_id", "dst_id"], "left_anti")
        .limit(int(n_prior / 200))
        .localCheckpoint(eager=True)
    )
    n_del, n_add = deleted.count(), added.count()
    today = (
        prior.join(deleted, ["src_id", "dst_id"], "left_anti")
        .unionByName(added)
        .persist()
    )
    today.count()

    samples: dict[str, list[float]] = {}
    sigs = set()
    order = ["cold", "derive", "delta"]
    for rep in range(reps):
        order = order[1:] + order[:1]  # rotate within the one JVM
        for v in order:
            t0 = time.monotonic()
            if v == "cold":
                res = connected_components(spark, today)
            elif v == "derive":
                res = incremental_components(
                    spark, today, prior_labels, prior, fallback_frac=None
                )
            else:
                res = incremental_components_from_delta(
                    spark, prior, prior_labels, added, deleted,
                    fallback_frac=None,
                )
            row = res.labels.agg(
                F.count(F.lit(1)), F.bit_xor(F.xxhash64("id", "component"))
            ).collect()[0]
            samples.setdefault(v, []).append(time.monotonic() - t0)
            sigs.add((row[0], row[1]))

    assert len(sigs) == 1, f"variants disagree: {sigs}"
    mins = {v: round(min(w), 2) for v, w in samples.items()}
    print(
        json.dumps(
            {
                "scale": scale,
                "n_edges": n_prior,
                "n_deleted": n_del,
                "n_added": n_add,
                "labels_identical": True,
                "min_sec": mins,
                "all_sec": {v: [round(x, 2) for x in w]
                            for v, w in samples.items()},
                "delta_over_derive": round(
                    mins["delta"] / mins["derive"], 3
                ),
                "delta_over_cold": round(mins["delta"] / mins["cold"], 3),
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
