from __future__ import annotations

import numpy as np
import pytest

from conftest import G_CYCLE, G_LINE, G_STAR, G_TRI, G_TWO_CC, edges_df
from oracles import pagerank_oracle

from bitcoinpagerank_spark.operators.pagerank import checksum, pagerank, top_k

GRAPHS = {
    "line": G_LINE,
    "cycle": G_CYCLE,
    "star": G_STAR,
    "tri": G_TRI,
    "two_cc": G_TWO_CC,
}


def _assert_matches_oracle(spark, edges, strategy, **kw):
    res = pagerank(spark, edges_df(spark, edges), strategy=strategy, **kw)
    got = {r["id"]: r["score"] for r in res.ranks.collect()}
    want = pagerank_oracle(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6), f"vertex {v}"
    return res


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_edges_strategy(spark, name):
    res = _assert_matches_oracle(spark, GRAPHS[name], "edges")
    assert res.converged
    # mass conservation every iteration (CheckSumPageRank analog)
    for m in res.metrics:
        assert m.total_mass == pytest.approx(1.0, abs=1e-9)


@pytest.mark.parametrize("name", ["cycle", "star", "two_cc"])
def test_pagerank_csr_strategy(spark, name):
    _assert_matches_oracle(spark, GRAPHS[name], "csr")


def test_cycle_exact(spark):
    # symmetric cycle → exactly 1/3 each
    res = pagerank(spark, edges_df(spark, G_CYCLE))
    for r in res.ranks.collect():
        assert r["score"] == pytest.approx(1 / 3, abs=1e-9)


def test_checksum_and_topk(spark):
    res = pagerank(spark, edges_df(spark, G_STAR))
    assert checksum(res.ranks) == 1.0
    top = top_k(res.ranks, 2).collect()
    want = pagerank_oracle(G_STAR)
    order = sorted(want, key=lambda v: (-want[v], v))
    assert [r["id"] for r in top] == order[:2]


def test_erdos_renyi_vs_oracle(spark):
    rng = np.random.default_rng(42)
    n, p = 200, 0.02
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    edges = [(int(i), int(j)) for i, j in zip(*mask.nonzero())]
    _assert_matches_oracle(spark, edges, "edges")


def test_csr_equals_edges_on_random(spark):
    rng = np.random.default_rng(7)
    n, p = 80, 0.05
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    edges = [(int(i), int(j)) for i, j in zip(*mask.nonzero())]
    a = pagerank(spark, edges_df(spark, edges), strategy="edges")
    b = pagerank(spark, edges_df(spark, edges), strategy="csr")
    ga = {r["id"]: r["score"] for r in a.ranks.collect()}
    gb = {r["id"]: r["score"] for r in b.ranks.collect()}
    for v in ga:
        assert ga[v] == pytest.approx(gb[v], abs=1e-9)
