"""N→4N EXECUTOR scaling on a real local standalone cluster.

This is the closest available realization of the north_rule's criterion
("spark-submit on a multi-executor cluster at N and 4N executors"): a
standalone master plus W separate WORKER JVMs (each taskset-pinned to its
own 4 physical cores, own heap, own shuffle dir, shuffle over loopback
TCP), with the driver pinned to 4 other cores so executor CPU supply is
clean. W=1 vs W=4 → 1 vs 4 executors × 4 cores.

Usage:
  python scripts/cluster_scaling.py            # orchestrate → BENCH_CLUSTER.json
  python scripts/cluster_scaling.py --driver N # internal: one measurement
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

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
EXEC_CORES = 4
PR_VERTICES = int(os.environ.get("CSCALE_PR_VERTICES", "4000000"))
# weak mode: vertices per WORKER (per-executor work constant across levels)
WEAK_VPW = int(os.environ.get("CSCALE_WEAK_VPW", "3000000"))
ITERS = int(os.environ.get("CSCALE_ITERS", "5"))
REPS = int(os.environ.get("CSCALE_REPS", "3"))
WORKER_LEVELS = tuple(
    int(c) for c in os.environ.get("CSCALE_WORKERS", "1,4").split(",")
)
RUN_WEAK = os.environ.get("CSCALE_WEAK", "1") != "0"
RUN_STRONG = os.environ.get("CSCALE_STRONG", "1") != "0"
DRIVER_CPUS = "28-31"


def _spark_env() -> dict:
    return {**os.environ, "SPARK_HOME": SPARK_HOME,
            "SPARK_MASTER_HOST": "127.0.0.1"}


def start_master() -> None:
    subprocess.run([f"{SPARK_HOME}/sbin/start-master.sh"], env=_spark_env(),
                   capture_output=True)
    time.sleep(4)


def stop_master() -> None:
    subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=_spark_env(),
                   capture_output=True)


def start_workers(n: int) -> list[subprocess.Popen]:
    procs = []
    for i in range(n):
        lo, hi = EXEC_CORES * i, EXEC_CORES * i + EXEC_CORES - 1
        log = open(f"/tmp/sworker{i}.log", "w")
        p = subprocess.Popen(
            ["taskset", "-c", f"{lo}-{hi}",
             f"{SPARK_HOME}/bin/spark-class",
             "org.apache.spark.deploy.worker.Worker", MASTER_URL,
             "--cores", str(EXEC_CORES), "--memory", "8g",
             "--work-dir", f"/tmp/sw{i}",
             "--webui-port", str(8181 + i)],
            env=_spark_env(), stdout=log, stderr=subprocess.STDOUT,
        )
        procs.append(p)
    time.sleep(8)
    return procs


def stop_workers(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=15)
        except subprocess.TimeoutExpired:
            p.kill()


def driver_measure(num_workers: int, vertices: int) -> dict:
    """Runs in its own process, pinned to DRIVER_CPUS."""
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    from bitcoinpagerank_spark.operators.pagerank import pagerank
    from bitcoinpagerank_spark.session import get_spark
    from scripts.scaling_bench import synth_edges

    total_cores = EXEC_CORES * num_workers
    spark = get_spark(
        app_name=f"cscale{num_workers}",
        master=MASTER_URL,
        shuffle_partitions=total_cores,
        extra_conf={
            "spark.executor.cores": str(EXEC_CORES),
            "spark.executor.memory": "6g",
            "spark.cores.max": str(total_cores),
            # each executor JVM is taskset-pinned to EXEC_CORES cpus but
            # sizes GC workers from the machine's 32 — pin them too
            "spark.executor.extraJavaOptions":
                f"-XX:ParallelGCThreads={EXEC_CORES} -XX:ConcGCThreads=1",
        },
    )
    edges = synth_edges(spark, vertices, total_cores).persist()
    n_edges = edges.count()
    pagerank(spark, edges, tol=0.0, max_iter=4, num_partitions=total_cores)
    t0 = time.monotonic()
    res = pagerank(spark, edges, tol=0.0, max_iter=ITERS,
                   num_partitions=total_cores)
    wall = time.monotonic() - t0
    return {
        "workers": num_workers,
        "executor_cores": EXEC_CORES,
        "n_edges": n_edges,
        "iterations": res.iterations,
        "wall_sec": round(wall, 3),
        "edges_per_sec": round(n_edges * res.iterations / wall, 1),
        "per_iter_sec": [round(m.wall_sec, 3) for m in res.metrics],
    }


def _run_driver(w: int, vertices: int, rep: int, tag: str, results) -> None:
    procs = start_workers(w)
    try:
        out = subprocess.run(
            ["taskset", "-c", DRIVER_CPUS, sys.executable,
             __file__, "--driver", str(w), "--vertices", str(vertices)],
            capture_output=True, text=True, cwd=str(REPO),
            env=_spark_env(), timeout=900,
        )
        if out.returncode != 0:
            print(out.stderr[-1500:], file=sys.stderr)
            raise SystemExit(f"driver failed (workers={w})")
        r = json.loads(out.stdout.strip().splitlines()[-1])
        results[w].append(r)
        print(f"rep{rep} {tag} workers={w}: {r['wall_sec']}s "
              f"({r['edges_per_sec']:,.0f} e/s, {r['n_edges']:,} edges)",
              flush=True)
    finally:
        stop_workers(procs)


def orchestrate() -> None:
    strong: dict[int, list[dict]] = {w: [] for w in WORKER_LEVELS}
    weak: dict[int, list[dict]] = {w: [] for w in WORKER_LEVELS}
    start_master()
    try:
        for rep in range(REPS):
            for w in WORKER_LEVELS:
                if RUN_STRONG:
                    _run_driver(w, PR_VERTICES, rep, "strong", strong)
                if RUN_WEAK:
                    _run_driver(w, WEAK_VPW * w, rep, "weak  ", weak)
    finally:
        stop_master()

    lo, hi = WORKER_LEVELS
    summary: dict = {
        "mode": "standalone cluster, separate worker JVMs, loopback shuffle",
        "fixed_iterations": ITERS,
        "executor_cores": EXEC_CORES,
        "reps": REPS,
    }
    med = lambda rs, w, k: statistics.median(r[k] for r in rs[w])  # noqa: E731
    if RUN_STRONG:
        m = {w: med(strong, w, "edges_per_sec") for w in WORKER_LEVELS}
        summary["strong"] = {
            "pr_vertices": PR_VERTICES,
            "n_edges": strong[lo][0]["n_edges"],
            "throughput_edges_per_sec": {str(w): m[w] for w in WORKER_LEVELS},
            "speedup": round(m[hi] / m[lo], 3),
            "scaling_efficiency": round(m[hi] / m[lo] / (hi / lo), 3),
        }
    if RUN_WEAK:
        t_lo = med(weak, lo, "wall_sec")
        t_hi = med(weak, hi, "wall_sec")
        summary["weak"] = {
            "vertices_per_worker": WEAK_VPW,
            "n_edges": {str(w): weak[w][0]["n_edges"] for w in WORKER_LEVELS},
            "wall_sec": {str(lo): t_lo, str(hi): t_hi},
            "throughput_edges_per_sec": {
                str(w): med(weak, w, "edges_per_sec") for w in WORKER_LEVELS
            },
            "scaling_efficiency": round(t_lo / t_hi, 3),
        }
    summary["raw"] = {
        "strong": {str(w): strong[w] for w in WORKER_LEVELS},
        "weak": {str(w): weak[w] for w in WORKER_LEVELS},
    }
    (REPO / "BENCH_CLUSTER.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps({k: v for k, v in summary.items() if k != "raw"}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--driver", type=int, default=0)
    ap.add_argument("--vertices", type=int, default=PR_VERTICES)
    args = ap.parse_args()
    if args.driver:
        print(json.dumps(driver_measure(args.driver, args.vertices)))
    else:
        orchestrate()
