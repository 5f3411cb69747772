"""Interleaved same-JVM A/B: current tip vs the r4 tip (d4642a5) for
q_components (connected_components) and q_triangles (triangle_count)
(judge r5 Next #4 — the two BENCH_r05 rows with no corresponding code
change; expected outcome: noise; prove it or name the commit).

Protocol (BENCH.md conventions): ONE JVM / SparkSession; the edge table
is built once with the CURRENT code and persisted, so both variants see
the identical input partitions; variants alternate in rotating order
within each rep; min-of-reps per (variant, query) is the record. The r4
package is loaded from a git worktree by purging bitcoinpagerank_spark*
modules and swapping the sys.path head — pyspark itself (and hence the
JVM) stays loaded.

Usage: python scripts/cc_tri_ab.py [reps=5] [n_pages=50000]
Emits one JSON line.
"""
from __future__ import annotations

import importlib
import json
import os
import sys
import time

CUR = "/root/repo"
R4 = "/tmp/r4tip"


def load_pkg(path: str):
    for m in list(sys.modules):
        if m.startswith("bitcoinpagerank_spark"):
            del sys.modules[m]
    sys.path = [p for p in sys.path if p not in (CUR, R4)]
    sys.path.insert(0, path)
    comp = importlib.import_module(
        "bitcoinpagerank_spark.operators.components"
    )
    tri = importlib.import_module("bitcoinpagerank_spark.operators.triangles")
    return comp, tri


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, CUR)
    from bitcoinpagerank_spark.session import get_spark
    from bitcoinpagerank_spark.plans.linkgraph import build_link_graph
    from bitcoinpagerank_spark.sources.pages import generate_pages

    spark = get_spark(
        app_name="cc-tri-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    pages = generate_pages(spark, n_pages, num_partitions=cpus)
    edges = build_link_graph(pages, num_partitions=max(cpus, 8)).edges.persist()
    n_edges = edges.count()

    # warmup both code paths once, untimed. NOTE: never hold two
    # variants' module objects at once — operators lazily
    # `from .edges import ...` at call time, which resolves against the
    # CURRENT sys.path head and would mix versions.
    for v in ("cur", "r4"):
        comp, tri = load_pkg(CUR if v == "cur" else R4)
        comp.connected_components(spark, edges).labels.count()
        tri.triangle_count(edges)

    samples: dict[str, list[float]] = {}
    order = ["cur", "r4"]
    checks: dict[str, set] = {}
    for rep in range(reps):
        order = order[::-1]  # rotate per rep within the one JVM
        for v in order:
            comp, tri = load_pkg(CUR if v == "cur" else R4)
            t0 = time.monotonic()
            cc = comp.connected_components(spark, edges)
            n_labels = cc.labels.count()
            samples.setdefault(f"components_{v}", []).append(
                time.monotonic() - t0
            )
            t0 = time.monotonic()
            t = tri.triangle_count(edges)
            samples.setdefault(f"triangles_{v}", []).append(
                time.monotonic() - t0
            )
            checks.setdefault(v, set()).add((n_labels, t))

    assert checks["cur"] == checks["r4"], f"results diverge: {checks}"
    out = {
        "n_pages": n_pages,
        "n_edges": n_edges,
        "cpus": cpus,
        "reps": reps,
        "load_1m": round(os.getloadavg()[0], 2),
        "results_identical": True,
        "min_sec": {k: round(min(v), 3) for k, v in samples.items()},
        "all_sec": {k: [round(x, 3) for x in v] for k, v in samples.items()},
    }
    for q in ("components", "triangles"):
        out[f"{q}_cur_over_r4"] = round(
            min(samples[f"{q}_cur"]) / min(samples[f"{q}_r4"]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
