"""Two-parallelism-level scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N→4N executor criterion is
evidenced by running the SAME jobs on the SAME deterministic input at two
local parallelism levels (SCALE_CORES, default 2 and 8 — i.e. N and 4N
cores; 8→32 is also measurable but crosses into SMT threads where even a
raw CPU busy-loop only scales ~2.8×, see the calibration). Two jobs:

  1. PageRank, fixed iterations (tol=0 → identical work) on an
     arithmetically generated link graph big enough that shuffle/compute
     dominates scheduling overhead (default 10M vertices / ~22M edges).
  2. The pages ETL (HTML extract → hash → dedup) — map-heavy, measures the
     Arrow-UDF path (default 150k pages).

Modes:
  --run --cores N    single measurement in this process → JSON line
  (no args)          orchestrator: one subprocess per (cores, rep),
                     medians → BENCH.md + BENCH_SCALING.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PR_VERTICES = int(os.environ.get("SCALE_PR_VERTICES", "10000000"))
ETL_PAGES = int(os.environ.get("SCALE_ETL_PAGES", "150000"))
ITERS = int(os.environ.get("SCALE_ITERS", "5"))
REPS = int(os.environ.get("SCALE_REPS", "3"))
CORE_LEVELS = tuple(
    int(c) for c in os.environ.get("SCALE_CORES", "2,8").split(",")
)


def synth_edges(spark, n: int, num_partitions: int):
    """The FIXTURES.md link structure generated arithmetically (no HTML
    round-trip): out-degree i%5 over multipliers, one heavy hub at 0 —
    identical semantics to pages→extract, used where ETL cost would
    swamp the measurement."""
    from pyspark.sql import functions as F

    base = spark.range(0, n, numPartitions=num_partitions).select(
        F.col("id").alias("src_id")
    )
    mult = [(7, 1), (13, 3), (19, 7), (23, 11)]
    parts = []
    for k, (a, b) in enumerate(mult):
        parts.append(
            base.where((F.col("src_id") % 5) > k)
            .where(F.col("src_id") != 0)
            .select(
                "src_id", ((F.col("src_id") * a + b) % n).alias("dst_id")
            )
        )
    hub = spark.range(1, min(n // 2, 500) + 1).select(
        F.lit(0).cast("long").alias("src_id"), F.col("id").alias("dst_id")
    )
    e = parts[0]
    for p in parts[1:]:
        e = e.unionAll(p)
    e = e.unionAll(hub)
    from bitcoinpagerank_spark.operators.edges import dedup_edges

    return dedup_edges(e).repartition(num_partitions, "src_id")


def _burn(secs: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < secs:
        x += 1
    return x


def _cpu_calibration(procs: int, secs: float = 1.5) -> float:
    """Measure CPU throughput available RIGHT NOW at this parallelism
    (multiprocessing busy-loop). The sandbox host carries variable load and
    its 32 vCPUs are ~16 physical cores with SMT, so Spark efficiency is
    reported both raw and normalized by this concurrently-measured supply."""
    import multiprocessing as mp

    with mp.Pool(procs) as pool:
        t0 = time.time()
        res = pool.map(_burn, [secs] * procs)
        dt = time.time() - t0
    return sum(res) / dt


def single_run(cores: int) -> dict:
    from bitcoinpagerank_spark.operators.pagerank import pagerank
    from bitcoinpagerank_spark.plans.linkgraph import build_link_graph
    from bitcoinpagerank_spark.session import get_spark
    from bitcoinpagerank_spark.sources.pages import generate_pages

    cal_before = _cpu_calibration(cores)

    spark = get_spark(
        app_name=f"scale{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )

    # ---- job 1: PageRank on the big arithmetic graph
    edges = synth_edges(spark, PR_VERTICES, cores).persist()
    n_edges = edges.count()
    pagerank(spark, edges, tol=0.0, max_iter=4, num_partitions=cores)  # deep warmup: JIT needs several iterations
    t0 = time.monotonic()
    res = pagerank(spark, edges, tol=0.0, max_iter=ITERS, num_partitions=cores)
    pr_wall = time.monotonic() - t0
    edges.unpersist()

    # ---- job 2: pages ETL (map-heavy Arrow-UDF path)
    build_link_graph(
        generate_pages(spark, 5000, num_partitions=cores), num_partitions=cores
    ).edges.count()  # warmup
    t0 = time.monotonic()
    lg = build_link_graph(
        generate_pages(spark, ETL_PAGES, num_partitions=cores),
        num_partitions=cores,
    )
    etl_edges = lg.edges.count()
    etl_wall = time.monotonic() - t0

    cal_after = _cpu_calibration(cores)

    return {
        "cores": cores,
        "cal_ops_per_sec": round((cal_before + cal_after) / 2, 1),
        "pr_vertices": PR_VERTICES,
        "n_edges": n_edges,
        "iterations": res.iterations,
        "pr_wall_sec": round(pr_wall, 3),
        "pr_edges_per_sec": round(n_edges * res.iterations / pr_wall, 1),
        "etl_pages": ETL_PAGES,
        "etl_edges": etl_edges,
        "etl_wall_sec": round(etl_wall, 3),
        "etl_pages_per_sec": round(ETL_PAGES / etl_wall, 1),
        "per_iter_sec": [round(m.wall_sec, 3) for m in res.metrics],
    }


def orchestrate() -> None:
    results: dict[int, list[dict]] = {c: [] for c in CORE_LEVELS}
    for rep in range(REPS):
        for cores in CORE_LEVELS:
            # taskset pins the whole JVM (GC/shuffle/netty threads included)
            # to exactly N cpus — local[N] alone only caps task slots, which
            # inflates the low-N leg and understates scaling
            out = subprocess.run(
                ["taskset", "-c", f"0-{cores-1}",
                 sys.executable, __file__, "--run", "--cores", str(cores)],
                capture_output=True, text=True, cwd=str(REPO),
                env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
            )
            if out.returncode != 0:
                print(out.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"run failed: cores={cores}")
            r = json.loads(out.stdout.strip().splitlines()[-1])
            results[cores].append(r)
            print(
                f"rep{rep} cores={cores}: pr {r['pr_wall_sec']}s "
                f"({r['pr_edges_per_sec']:,.0f} e/s)  "
                f"etl {r['etl_wall_sec']}s ({r['etl_pages_per_sec']:,.0f} p/s)",
                flush=True,
            )

    lo, hi = CORE_LEVELS
    med = lambda c, k: statistics.median(r[k] for r in results[c])  # noqa: E731
    cal_ratio = med(hi, "cal_ops_per_sec") / med(lo, "cal_ops_per_sec")
    summary = {
        "pr_vertices": PR_VERTICES,
        "n_edges": results[lo][0]["n_edges"],
        "fixed_iterations": ITERS,
        "etl_pages": ETL_PAGES,
        "reps": REPS,
        "cpu_calibration": {
            "ops_per_sec": {str(c): med(c, "cal_ops_per_sec") for c in CORE_LEVELS},
            "hw_speedup": round(cal_ratio, 3),
            "hw_efficiency": round(cal_ratio / (hi / lo), 3),
        },
        "pagerank": {
            "throughput_edges_per_sec": {
                str(c): med(c, "pr_edges_per_sec") for c in CORE_LEVELS
            },
            "speedup": round(med(hi, "pr_edges_per_sec") / med(lo, "pr_edges_per_sec"), 3),
            "scaling_efficiency": round(
                med(hi, "pr_edges_per_sec") / med(lo, "pr_edges_per_sec") / (hi / lo), 3
            ),
            "efficiency_vs_available_cpu": round(
                med(hi, "pr_edges_per_sec") / med(lo, "pr_edges_per_sec") / cal_ratio, 3
            ),
        },
        "etl": {
            "throughput_pages_per_sec": {
                str(c): med(c, "etl_pages_per_sec") for c in CORE_LEVELS
            },
            "speedup": round(med(hi, "etl_pages_per_sec") / med(lo, "etl_pages_per_sec"), 3),
            "scaling_efficiency": round(
                med(hi, "etl_pages_per_sec") / med(lo, "etl_pages_per_sec") / (hi / lo), 3
            ),
            "efficiency_vs_available_cpu": round(
                med(hi, "etl_pages_per_sec") / med(lo, "etl_pages_per_sec") / cal_ratio, 3
            ),
        },
        "raw": {str(c): results[c] for c in CORE_LEVELS},
    }
    (REPO / "BENCH_SCALING.json").write_text(json.dumps(summary, indent=1))
    (REPO / "BENCH.md").write_text(_render_md(summary))
    print(json.dumps({k: v for k, v in summary.items() if k != "raw"}))


def _render_md(s: dict) -> str:
    lo, hi = CORE_LEVELS

    def row(job, key, unit):
        tp = s[job][key]
        return (
            f"| {job} | {tp[str(lo)]:,.0f} {unit} | {tp[str(hi)]:,.0f} {unit} | "
            f"{s[job]['speedup']}× | {s[job]['scaling_efficiency']} | "
            f"{s[job]['efficiency_vs_available_cpu']} |"
        )

    return f"""# BENCH — two-parallelism-level scaling evidence

Per the driver instructions, the north_rule's N→4N executor criterion is
evidenced locally: the same jobs on the same deterministic inputs at
local[{lo}] and local[{hi}] (4× cores) in separate JVMs, {s['reps']} reps
each, median throughput.

- PageRank: fixed {s['fixed_iterations']} iterations (tol=0 → identical
  work) on {s['pr_vertices']:,} vertices / {s['n_edges']:,} deduplicated
  edges (arithmetic graph, FIXTURES.md link structure incl. heavy hub).
- ETL: pages→extract(Arrow UDF)→hash→dedup on {s['etl_pages']:,} pages.

| job | local[{lo}] | local[{hi}] | speedup (ideal {hi//lo}×) | efficiency (target ≥0.8) | vs available CPU |
|---|---|---|---|---|---|
{row('pagerank', 'throughput_edges_per_sec', 'edges·iter/s')}
{row('etl', 'throughput_pages_per_sec', 'pages/s')}

Hardware context (measured in the same windows): a raw CPU busy-loop at
{lo} vs {hi} processes gives **{s['cpu_calibration']['hw_speedup']}×**
(efficiency {s['cpu_calibration']['hw_efficiency']}) — the {hi} vCPUs are
~{hi//2} SMT threads on fewer physical cores plus variable host load, so
this is the attainable ceiling for ANY {lo}→{hi} thread scaling on this box.
The "vs available CPU" column divides the Spark speedup by this measured
hardware ratio.

Caveats: single-machine thread scaling is a LOWER bound on multi-executor
scaling — all {hi} threads share one JVM heap, shuffle disk, and memory
bus, and the sandbox host carries background load; a real 4N-executor
cluster adds network shuffle but removes shared-resource contention.
Raw per-rep JSON: `BENCH_SCALING.json`.
"""


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()
    if args.run:
        print(json.dumps(single_run(args.cores)))
    else:
        orchestrate()
