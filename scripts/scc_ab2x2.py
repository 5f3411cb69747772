"""Interleaved 2×2 SCC A/B on one JVM (judge r4 Next #2): trim on/off ×
closure checkpoint eager/plain, on either the sf doc graph or an R-MAT
graph. Interleaving (variant order rotates within each rep) is the only
regression-proof protocol on this time-shared host (BENCH.md).

Usage:
  python scripts/scc_ab2x2.py doc:/root/testdata/sf0.1 [reps] [cores]
  python scripts/scc_ab2x2.py rmat:18 [reps] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bitcoinpagerank_spark.operators.scc import (  # noqa: E402
    strongly_connected_components,
)
from bitcoinpagerank_spark.session import get_spark  # noqa: E402

VARIANTS = [
    ("trim_eager", dict(trim=True, closure_checkpoint="eager")),
    ("trim_plain", dict(trim=True, closure_checkpoint="plain")),
    ("notrim_eager", dict(trim=False, closure_checkpoint="eager")),
    ("notrim_plain", dict(trim=False, closure_checkpoint="plain")),
]


def main():
    graph = sys.argv[1] if len(sys.argv) > 1 else "doc:/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(app_name="scc_ab2x2", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    if graph.startswith("doc:"):
        from bitcoinpagerank_spark.plans.catalog import doc_edges

        e = doc_edges(spark, graph.split(":", 1)[1]).persist()
    else:
        from bitcoinpagerank_spark.sources.rmat import rmat_edges

        scale = int(graph.split(":", 1)[1])
        e = rmat_edges(spark, scale=scale, num_partitions=cores).persist()
    n_edges = e.count()

    # warmup all four paths on a slice so codegen/JIT is steady-state
    warm = e.limit(20000).persist()
    warm.count()
    for _, kw in VARIANTS:
        strongly_connected_components(spark, warm, num_partitions=cores, **kw)
    warm.unpersist()

    walls: dict[str, list[float]] = {n: [] for n, _ in VARIANTS}
    labels_ref = None
    detail: dict = {}
    for rep in range(reps):
        order = VARIANTS[rep % 4:] + VARIANTS[:rep % 4]  # rotate start
        for name, kw in order:
            t0 = time.monotonic()
            res = strongly_connected_components(
                spark, e, num_partitions=cores, **kw
            )
            res.labels.count()
            walls[name].append(round(time.monotonic() - t0, 2))
            if rep == 0:
                trims = [m for m in res.metrics
                         if str(m["closure"]).startswith("trim")]
                detail[name] = {
                    "closure_rounds": sum(
                        1 for m in res.metrics
                        if not str(m["closure"]).startswith("trim")),
                    "trim_checks": len(trims),
                    "peeled": sum(
                        m["changed"] for m in trims
                        if not str(m["closure"]).endswith("_bail")),
                }
                if labels_ref is None:
                    labels_ref = res.labels.persist()
                    labels_ref.count()
                else:
                    same = (res.labels.subtract(labels_ref).isEmpty()
                            and labels_ref.subtract(res.labels).isEmpty())
                    detail[name]["labels_match_ref"] = same

    out = {
        "graph": graph, "n_edges": n_edges, "cores": cores, "reps": reps,
        "load_1m": round(os.getloadavg()[0], 2),
        "min_wall_sec": {n: min(w) for n, w in walls.items()},
        "all_walls": walls,
        "detail": detail,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
