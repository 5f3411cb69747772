"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (PageRank to convergence on the
deterministic documents-derived link graph at sf0.001, top-20 by score).
``queries()`` / ``oracle_sql()`` expose the full operator catalog
(bitcoinpagerank_spark/plans/catalog.py): 129 DuckDB-verifiable operators
plus 7 rows-only entries for the non-SQL-expressible approximate/iterative
ops (each of those is oracle-tested in pytest instead). Registration
order puts never-driver-checked oracled entries first (red entries ahead
of them) so the harness's bounded correctness window rotates through the
whole catalog across rounds; rows-only entries are ordered last.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bitcoinpagerank_spark.plans import catalog  # noqa: E402
from bitcoinpagerank_spark.session import ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank (damped, dangling-aware, L1 ≤ 1e-6) on the
    sf0.001 documents-derived edge table → top-20 (id, score)."""
    from pyspark.sql import functions as F

    from bitcoinpagerank_spark.operators.pagerank import pagerank, top_k

    ship_package(spark)
    edges = catalog.doc_edges(spark, "/root/testdata/sf0.001")
    res = pagerank(spark, edges, tol=1e-6, max_iter=100)
    return top_k(res.ranks, 20).select("id", F.round("score", 9).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + pipeline ops."""
    wrapped = {}
    for name, fn in catalog.queries().items():
        def make(f):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                ship_package(spark)
                return f(spark, sf_dir)
            return run
        wrapped[name] = make(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names/aliases)."""
    return catalog.oracle_sql()
