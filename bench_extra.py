"""Round-7 optimization measurement harness (bench.py is FROZEN — this
file carries the guide §1 extras: noop-sink isolation per query, plan
capture, and sub-step timing for the iterative operators).

Usage:
  python bench_extra.py time  NAME [NAME...] [--reps N] [--sink noop|count]
  python bench_extra.py plans NAME [NAME...] --tag before|after
  python bench_extra.py all-plans --tag before|after

NAME is either a catalog entry (e.g. doc_lsh_pairs) or one of the
bench.py composite thunks: q_pagerank / q_components / q_triangles /
q_edge_etl. Timing uses the noop sink by default (guide §1.4) so the
computation is measured, not the sink; `--sink count` reproduces
bench.py's methodology exactly for comparability.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32) — same contract as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bitcoinpagerank_spark.session import get_spark  # noqa: E402


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _build(spark, sf_dir, name):
    """Return a zero-arg thunk computing the named query (None-returning
    thunks time a composite op that is not a single DataFrame)."""
    from bitcoinpagerank_spark.plans import catalog

    if name in ("q_pagerank", "q_components", "q_triangles", "q_edge_etl"):
        from bitcoinpagerank_spark.operators.components import (
            connected_components,
        )
        from bitcoinpagerank_spark.operators.pagerank import pagerank
        from bitcoinpagerank_spark.operators.triangles import triangle_count
        from bitcoinpagerank_spark.plans.linkgraph import build_link_graph
        from bitcoinpagerank_spark.sources.pages import generate_pages

        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
        n_pages = int(
            os.environ.get("BENCH_PAGES", str(max(5000, int(500_000 * sf))))
        )
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

        def edges():
            pages = generate_pages(spark, n_pages, num_partitions=cpus)
            return build_link_graph(pages, num_partitions=max(cpus, 8)).edges

        if name == "q_edge_etl":
            return lambda: edges().count()
        e = edges().persist()
        e.count()
        if name == "q_pagerank":
            return lambda: pagerank(spark, e, tol=1e-6, max_iter=100)
        if name == "q_components":
            return lambda: connected_components(spark, e).labels.count()
        return lambda: triangle_count(e)

    cat = catalog.queries()
    fn = cat[name]
    return lambda: fn(spark, sf_dir)


def cmd_time(args):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    out = {}
    for name in args.names:
        thunk = _build(spark, sf_dir, name)
        walls = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            r = thunk()
            if hasattr(r, "write"):
                if args.sink == "noop":
                    _noop(r)
                else:
                    r.count()
            walls.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"samples": walls, "min": min(walls)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sink": args.sink, "results": out}))


def cmd_plans(args):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    from bitcoinpagerank_spark.plans import catalog

    plan_dir = Path(__file__).resolve().parent / "plans" / "r07"
    plan_dir.mkdir(parents=True, exist_ok=True)
    names = args.names
    if getattr(args, "all", False):
        names = [
            "rel_join_chain", "rel_topk", "rel_group_collect", "doc_minhash",
            "doc_lsh_pairs", "emb_ann_topk", "ev_tumbling_window", "g_scc",
            "g_predicted_links", "ev_sliding_window", "rel_kmv_distinct",
            "g_katz_iter3", "rel_asof_join", "doc_tfidf_top",
            "doc_neardup_clusters", "g_louvain_r2", "g_wl_fingerprint_r2",
            "g_mis_r2",
        ]
    cat = catalog.queries()
    for name in names:
        df = cat[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = plan_dir / f"{name}_{args.tag}.txt"
        path.write_text(txt)
        print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("time")
    t.add_argument("names", nargs="+")
    t.add_argument("--reps", type=int, default=3)
    t.add_argument("--sink", choices=["noop", "count"], default="noop")
    t.set_defaults(func=cmd_time)
    p = sub.add_parser("plans")
    p.add_argument("names", nargs="*")
    p.add_argument("--tag", required=True)
    p.set_defaults(func=cmd_plans)
    a = sub.add_parser("all-plans")
    a.add_argument("--tag", required=True)
    a.set_defaults(func=cmd_plans, all=True, names=[])
    args = ap.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
