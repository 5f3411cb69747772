"""Sampled betweenness vs a sequential Brandes oracle."""

from __future__ import annotations

from collections import defaultdict, deque

import pytest

from conftest import G_CYCLE, G_STAR, G_TRI, edges_df
from bitcoinpagerank_spark.operators.betweenness import betweenness_centrality

G_RAND = sorted(
    {((i * 7 + 3) % 30, (i * 13 + 5) % 30) for i in range(120)}
    | {(0, j) for j in range(1, 12)}
)
G_RAND = [(s, d) for s, d in G_RAND if s != d]


def brandes_oracle(edges, sources, max_depth=None):
    """Directed Brandes dependency accumulation from the given sources;
    max_depth truncates the forward BFS (the catalog's fixed-level
    contract)."""
    adj = defaultdict(list)
    for s, d in set(edges):
        if s != d:
            adj[s].append(d)
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            if max_depth is not None and dist[u] >= max_depth:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return dict(bc)


@pytest.mark.parametrize("edges,sources", [
    (G_TRI, [1]),
    (G_CYCLE, [1, 2]),
    (G_STAR, [1]),
    (G_RAND, [0, 5, 17]),
])
def test_betweenness_vs_brandes(spark, edges, sources):
    res = betweenness_centrality(spark, edges_df(spark, edges), sources)
    assert res.converged
    got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    want = brandes_oracle(edges, sources)
    want = {k: v for k, v in want.items() if v != 0.0}
    got_nz = {k: v for k, v in got.items() if abs(v) > 1e-12}
    assert set(got_nz) == set(want)
    for k, v in want.items():
        assert got_nz[k] == pytest.approx(v, abs=1e-9)


def test_betweenness_truncated_matches_truncated_oracle(spark):
    res = betweenness_centrality(
        spark, edges_df(spark, G_RAND), [0, 5], max_iter=3
    )
    got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    want = brandes_oracle(G_RAND, [0, 5], max_depth=3)
    want = {k: v for k, v in want.items() if v != 0.0}
    got_nz = {k: v for k, v in got.items() if abs(v) > 1e-12}
    assert set(got_nz) == set(want)
    for k, v in want.items():
        assert got_nz[k] == pytest.approx(v, abs=1e-9)
    assert all("shuffle_write_bytes" in m for m in res.metrics)
