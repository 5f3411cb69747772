"""Scale-stress for r5's incremental_components (judge r5 Next #5):
two graph shapes, deltas of 0.1% / 1% / 10% of edges changed (half
deletions, half additions), recording wall vs |delta| against the
claimed contract — incremental cost scales with the delta neighborhood
+ |V_clean|, NOT with |E| — plus cold-recompute wall and a
labels-equality check per fraction.

Shapes:
  rmat   — single R-MAT-18 (giant component): ANY interior deletion
           dirties the whole component, the degenerate case. The
           measured r6 finding: the reduction ran 2.4x SLOWER than cold
           here, which is why incremental_components now auto-falls
           back to cold when dirty mass > fallback_frac of vertices —
           this leg verifies the fallback holds incremental ≈ cold.
  blocks — 32 disjoint R-MAT-13 blocks (the host-graph / sharded-crawl
           shape) with the delta CONFINED to 2 blocks: dirty mass ~6%,
           the regime the reduction was built for — this leg records
           the speedup and its scaling with |delta|. At edge factor 16
           the post-dedup graph has |E|/|V| ~ 2.75, so the reduced
           input's floor (|V_clean| label stars) caps the shuffle-volume
           win near 1.5x; wall clock at sandbox scale is fixed-overhead
           bound either way.
  blocks_dense — same block layout at edge factor 128 (|E| >> |V|):
           the regime where dropping clean-clean edges turns the
           shuffle-volume contract into wall-clock wins.

Deterministic delta: deletions = edges under an xxhash64 bucket cut;
additions = R-MAT edges from a different seed (same skew law, the
adversarial case for the dirty-set machinery).

Usage: python scripts/incr_cc_stress.py [scale=18] [shape=both]
Emits one JSON line per (shape, delta fraction) + summary lines.
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
)
from bitcoinpagerank_spark.session import get_spark
from bitcoinpagerank_spark.sources.rmat import rmat_edges


def run_shape(spark, shape: str, scale: int, cpus: int) -> None:
    if shape == "rmat":
        prior = rmat_edges(spark, scale=scale, num_partitions=cpus).persist()
        delta_filter = None  # deltas drawn graph-wide
    else:
        # blocks: |E|/|V| ~ 2.75 after dedup — the reduced input's floor
        # (|V_clean| label stars) caps the win; blocks_dense (x8 edge
        # factor) is the |E| >> |V| regime where the reduction's
        # shuffle-volume contract turns into wall-clock
        factor = 128 if shape == "blocks_dense" else 16
        n_blocks, block_scale = 32, scale - 5
        base = rmat_edges(
            spark, scale=block_scale,
            n_edges=factor * (1 << block_scale) * n_blocks,
            seed=7, num_partitions=cpus, dedup=False,
        )
        blk = F.pmod(
            F.xxhash64(F.col("src_id") * 7 + F.col("dst_id")),
            F.lit(n_blocks),
        )
        off = blk * (1 << block_scale)
        prior = (
            base.select(
                (F.col("src_id") + off).alias("src_id"),
                (F.col("dst_id") + off).alias("dst_id"),
            )
            .where(F.col("src_id") != F.col("dst_id"))
            .distinct()
            .persist()
        )
        # confine the delta to blocks 0 and 1 (ids < 2 << block_scale)
        delta_filter = F.greatest("src_id", "dst_id") < (2 << block_scale)
    n_prior = prior.count()
    t0 = time.monotonic()
    prior_cc = connected_components(spark, prior)
    prior_labels = prior_cc.labels.localCheckpoint(eager=True)
    prior_wall = time.monotonic() - t0

    cpus_ = cpus
    pool = rmat_edges(spark, scale=scale, seed=99, num_partitions=cpus_)
    if delta_filter is not None:
        pool = pool.where(delta_filter)
    adds_pool = pool.join(prior, ["src_id", "dst_id"], "left_anti").persist()
    n_pool = adds_pool.count()

    rows = []
    for frac_pm in (1, 10, 100):  # per-mille of |E| changed: 0.1%/1%/10%
        n_del = int(n_prior * frac_pm / 2000)
        n_add = int(n_prior * frac_pm / 2000)
        # deterministic pseudo-random subset: rank edges by xxhash64
        del_keys = F.pmod(F.xxhash64("src_id", "dst_id"), F.lit(1_000_000))
        del_pool = prior if delta_filter is None else prior.where(delta_filter)
        n_delpool = del_pool.count()
        del_cut = int(1_000_000 * min(n_del, n_delpool) / max(n_delpool, 1))
        deleted = del_pool.where(del_keys < del_cut)
        added = adds_pool.where(
            F.pmod(F.xxhash64("dst_id", "src_id"), F.lit(1_000_000))
            < int(1_000_000 * n_add / max(n_pool, 1))
        )
        today = (
            prior.join(deleted, ["src_id", "dst_id"], "left_anti")
            .unionByName(added)
            .persist()
        )
        n_today = today.count()
        n_changed = deleted.count() + added.count()

        t0 = time.monotonic()
        inc = incremental_components(spark, today, prior_labels, prior)
        inc_rows = inc.labels.count()
        inc_wall = time.monotonic() - t0

        t0 = time.monotonic()
        cold = connected_components(spark, today)
        cold_rows = cold.labels.count()
        cold_wall = time.monotonic() - t0

        mismatch = (
            inc.labels.alias("a")
            .join(
                cold.labels.alias("b"),
                (F.col("a.id") == F.col("b.id"))
                & (F.col("a.component") != F.col("b.component")),
            )
            .count()
        )
        row = {
            "shape": shape,
            "delta_pct": frac_pm / 10,
            "n_edges": n_prior,
            "n_today": n_today,
            "n_changed_edges": n_changed,
            "incremental_sec": round(inc_wall, 2),
            "cold_sec": round(cold_wall, 2),
            "speedup": round(cold_wall / inc_wall, 2),
            "inc_rounds": inc.iterations,
            "cold_rounds": cold.iterations,
            "labels_match": mismatch == 0 and inc_rows == cold_rows,
            "round1_pairs_incremental": inc.metrics[0]["pairs"]
            if inc.metrics
            else None,
            "round1_pairs_cold": cold.metrics[0]["pairs"]
            if cold.metrics
            else None,
            "load_1m": round(os.getloadavg()[0], 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        today.unpersist()

    print(
        json.dumps(
            {
                "summary": "incr_cc_stress",
                "shape": shape,
                "scale": scale,
                "prior_cold_sec": round(prior_wall, 2),
                "walls": [r["incremental_sec"] for r in rows],
                "deltas_pct": [r["delta_pct"] for r in rows],
                "all_match": all(r["labels_match"] for r in rows),
            }
        ),
        flush=True,
    )
    prior.unpersist()
    adds_pool.unpersist()


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    shape = sys.argv[2] if len(sys.argv) > 2 else "both"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="incr-cc-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    shapes = (
        ("rmat", "blocks", "blocks_dense") if shape == "both" else (shape,)
    )
    for s in shapes:
        run_shape(spark, s, scale, cpus)


if __name__ == "__main__":
    main()
