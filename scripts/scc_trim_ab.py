"""Interleaved A/B: SCC with vs without the FW-BW-Trim pre-pass.

Evidence for the round-4 trim addition (operators/scc.py): on power-law
digraphs (R-MAT — the web-crawl shape) most vertices are trivial SCCs;
trim peels them with cheap degree checks so the expensive forward +
backward min-label closures run on the cyclic core only. Both variants
run interleaved in one JVM (the only regression-proof protocol on this
time-shared host, per BENCH.md).

Usage: python scripts/scc_trim_ab.py [scale] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bitcoinpagerank_spark.session import get_spark  # noqa: E402
from bitcoinpagerank_spark.operators.scc import (  # noqa: E402
    strongly_connected_components,
)
from bitcoinpagerank_spark.sources.rmat import rmat_edges  # noqa: E402


def closure_rounds(metrics):
    return sum(1 for m in metrics if not str(m["closure"]).startswith("trim"))


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = 16
    spark = get_spark(app_name="scc_trim_ab", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    e = rmat_edges(spark, scale=scale, num_partitions=cores).persist()
    n_edges = e.count()
    # warmup both paths on a slice
    sm = rmat_edges(spark, scale=10, num_partitions=cores)
    strongly_connected_components(spark, sm, num_partitions=cores)
    strongly_connected_components(spark, sm, num_partitions=cores, trim=False)

    walls = {"trim": [], "no_trim": []}
    detail = {}
    for rep in range(reps):
        t0 = time.monotonic()
        rt = strongly_connected_components(spark, e, num_partitions=cores)
        walls["trim"].append(time.monotonic() - t0)
        t0 = time.monotonic()
        rn = strongly_connected_components(spark, e, num_partitions=cores,
                                           trim=False)
        walls["no_trim"].append(time.monotonic() - t0)
        if rep == 0:
            peeled = sum(m["changed"] for m in rt.metrics
                         if str(m["closure"]).startswith("trim"))
            detail = {
                "n_vertices": rt.labels.count(),
                "peeled_by_trim": peeled,
                "closure_rounds_trim": closure_rounds(rt.metrics),
                "closure_rounds_no_trim": closure_rounds(rn.metrics),
                "labels_match": rt.labels.subtract(rn.labels).isEmpty()
                and rn.labels.subtract(rt.labels).isEmpty(),
            }
    tw, nw = min(walls["trim"]), min(walls["no_trim"])
    print(f"R-MAT scale={scale}: {n_edges} edges, {detail['n_vertices']} vertices")
    print(f"trim peeled {detail['peeled_by_trim']} trivial SCCs; closure rounds "
          f"{detail['closure_rounds_trim']} (trim) vs "
          f"{detail['closure_rounds_no_trim']} (no trim); "
          f"labels identical: {detail['labels_match']}")
    print(f"trim: {tw:.1f}s  no-trim: {nw:.1f}s  speedup x{nw / tw:.2f}  "
          f"(min of {reps} interleaved reps)")


if __name__ == "__main__":
    main()
