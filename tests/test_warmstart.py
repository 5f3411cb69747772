"""Incremental (warm-start) PageRank on an evolved graph."""

from __future__ import annotations

import pytest

from bitcoinpagerank_spark.operators.pagerank import (
    checksum,
    pagerank,
    warm_start_pagerank,
)
from conftest import edges_df


def _graph(n=300):
    e = {( i, (i * 7 + 1) % n) for i in range(n)} | {
        (i, (i * 13 + 3) % n) for i in range(n) if i % 3
    }
    return sorted((s, d) for s, d in e if s != d)


def test_warm_start_converges_faster_to_same_fixpoint(spark):
    base = _graph()
    cold = pagerank(spark, edges_df(spark, base), tol=1e-9, max_iter=200)
    assert cold.converged

    # evolve: a handful of new edges, incl. one brand-new vertex 1000
    evolved = base + [(1, 1000), (1000, 2), (5, 17), (17, 5)]
    cold2 = pagerank(spark, edges_df(spark, evolved), tol=1e-9, max_iter=200)
    warm = warm_start_pagerank(
        spark, edges_df(spark, evolved), cold.ranks, tol=1e-9, max_iter=200
    )
    assert warm.converged
    assert warm.iterations < cold2.iterations  # the whole point
    assert checksum(warm.ranks, digits=6) == 1.0

    got = {r["id"]: r["score"] for r in warm.ranks.collect()}
    want = {r["id"]: r["score"] for r in cold2.ranks.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_warm_start_handles_departed_vertices(spark):
    base = _graph()
    prior = pagerank(spark, edges_df(spark, base), tol=1e-6, max_iter=100)
    shrunk = [(s, d) for s, d in base if s < 200 and d < 200]
    warm = warm_start_pagerank(
        spark, edges_df(spark, shrunk), prior.ranks, tol=1e-6, max_iter=100
    )
    assert warm.converged
    ids = {r["id"] for r in warm.ranks.collect()}
    assert max(ids) < 200  # departed vertices dropped
    assert checksum(warm.ranks, digits=6) == 1.0
