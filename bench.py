"""Headline benchmark: prints ONE JSON line.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32). The flagship metric follows
BASELINE.json: PageRank throughput in edges processed/sec to 1e-6
convergence, measured on the deterministic synthetic link graph (pages →
extract → edges) scaled with sf, plus the breadth queries from the catalog
at the given sf_dir.

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_PAGES          override page count for the PageRank graph
  BENCH_ONLY           comma-separated subset of query names to run
  BENCH_REPS           reps per query, median recorded (default 2 —
                       the sandbox host is time-shared and single runs
                       vary 2-3x between minutes)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bitcoinpagerank_spark.session import get_spark  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_pages = int(os.environ.get("BENCH_PAGES", str(max(5000, int(500_000 * sf)))))
    only = set(
        s for s in os.environ.get("BENCH_ONLY", "").split(",") if s
    )

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    from pyspark.sql import functions as F

    from bitcoinpagerank_spark.operators.components import connected_components
    from bitcoinpagerank_spark.operators.pagerank import pagerank
    from bitcoinpagerank_spark.operators.triangles import triangle_count
    from bitcoinpagerank_spark.plans import catalog
    from bitcoinpagerank_spark.plans.linkgraph import build_link_graph
    from bitcoinpagerank_spark.sources.pages import generate_pages

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # untimed warmup: exercise codegen/JIT paths once on a miniature graph
    # so timings below reflect steady-state throughput, not JVM warmup
    if os.environ.get("BENCH_WARMUP", "1") != "0":
        wp = generate_pages(spark, 2000, num_partitions=8)
        we = build_link_graph(wp, num_partitions=8).edges.persist()
        we.count()
        pagerank(spark, we, tol=0.0, max_iter=2)
        we.unpersist()

    reps = int(os.environ.get("BENCH_REPS", "2"))

    def timed(name, fn, n_reps=None):
        if only and name not in only:
            return None
        walls, out = [], None
        for _ in range(n_reps or reps):
            t0 = time.monotonic()
            out = fn()
            walls.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(walls), 3)
        return out

    # ---- flagship: pages → edges → PageRank to 1e-6 on the synthetic graph
    def run_etl():
        pages = generate_pages(spark, n_pages, num_partitions=cpus)
        lg = build_link_graph(pages, num_partitions=max(cpus, 8))
        edges = lg.edges.persist()
        extra["n_edges"] = edges.count()
        if getattr(run_etl, "_prev", None) is not None:
            run_etl._prev.unpersist()  # reps re-run the ETL; keep one cached
        run_etl._prev = edges
        return edges

    edges = timed("q_edge_etl", run_etl)
    if edges is None and (not only or "q_pagerank" in only or
                          "q_components" in only or "q_triangles" in only):
        pages = generate_pages(spark, n_pages, num_partitions=cpus)
        edges = build_link_graph(pages, num_partitions=max(cpus, 8)).edges.persist()
        extra["n_edges"] = edges.count()

    def run_pr():
        res = pagerank(spark, edges, tol=1e-6, max_iter=100)
        extra["pagerank_iterations"] = res.iterations
        extra["pagerank_converged"] = bool(res.converged)
        return res

    timed("q_pagerank", run_pr)
    if "q_pagerank" in timings:
        edges_processed = extra["n_edges"] * extra["pagerank_iterations"]
        extra["pagerank_edges_per_sec"] = round(
            edges_processed / timings["q_pagerank"], 1
        )

    timed("q_components", lambda: connected_components(spark, edges).labels.count())
    timed("q_triangles", lambda: triangle_count(edges))

    # ---- breadth: catalog queries on the sf_dir tables
    cat = catalog.queries()
    for name in [
        "rel_join_chain",
        "rel_topk",
        "rel_group_collect",
        "doc_minhash",
        "doc_lsh_pairs",
        "emb_ann_topk",
        "ev_tumbling_window",
        # r3 breadth headliners
        "g_scc",
        "g_predicted_links",
        "ev_sliding_window",
        "rel_kmv_distinct",
        "g_katz_iter3",
        "rel_asof_join",
        "doc_tfidf_top",
        "doc_neardup_clusters",
        "g_louvain_r2",
        "g_wl_fingerprint_r2",
        "g_mis_r2",
    ]:
        timed(f"q_{name}", lambda n=name: cat[n](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "pagerank_to_1e-6_plus_catalog_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_pages": n_pages,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
