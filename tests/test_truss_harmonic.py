"""K-truss and harmonic centrality vs sequential oracles."""

from __future__ import annotations

from collections import defaultdict, deque

import pytest

from conftest import G_CYCLE, G_STAR, G_TRI, edges_df
from bitcoinpagerank_spark.operators.ktruss import k_truss
from bitcoinpagerank_spark.operators.bfs import harmonic_centrality, labeled_bfs

G_RAND = sorted(
    {((i * 7 + 3) % 30, (i * 13 + 5) % 30) for i in range(120)}
    | {(0, j) for j in range(1, 12)}
)
G_RAND = [(s, d) for s, d in G_RAND if s != d]


def _canon_edges(edges):
    return {(min(s, d), max(s, d)) for s, d in edges if s != d}


def _supports(canon):
    adj = defaultdict(set)
    for u, v in canon:
        adj[u].add(v)
        adj[v].add(u)
    return {
        (u, v): len(adj[u] & adj[v])
        for u, v in canon
    }


def ktruss_oracle(edges, k):
    """Sequential peel to fixpoint → {(u,v): support in final subgraph}."""
    cur = _canon_edges(edges)
    while True:
        sup = _supports(cur)
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return sup
        cur = nxt


@pytest.mark.parametrize("edges,k", [
    (G_TRI, 3), (G_CYCLE, 3), (G_STAR, 3), (G_RAND, 3), (G_RAND, 4),
])
def test_ktruss_converged_vs_peel_oracle(spark, edges, k):
    res = k_truss(spark, edges_df(spark, edges), k=k)
    assert res.converged
    got = {(r["u"], r["v"]): r["support"] for r in res.edges.collect()}
    assert got == ktruss_oracle(edges, k)
    # converged truss invariant: every surviving edge has support >= k-2
    assert all(s >= k - 2 for s in got.values())


def test_ktruss_fixed_rounds_monotone(spark):
    """Edge sets shrink monotonically with peel depth; round metrics carry
    shuffle bytes."""
    df = edges_df(spark, G_RAND)
    prev = None
    for r in (1, 2, 3):
        res = k_truss(spark, df, k=4, max_iter=r)
        cur = {(x["u"], x["v"]) for x in res.edges.collect()}
        if prev is not None:
            assert cur <= prev
        prev = cur
        assert all("shuffle_write_bytes" in m for m in res.metrics)
    assert k_truss(spark, df, k=4).edges.count() <= len(prev)


def test_ktruss_k_validation(spark):
    with pytest.raises(ValueError):
        k_truss(spark, edges_df(spark, G_TRI), k=2)


def _bfs_oracle(edges, src):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


@pytest.mark.parametrize("seeds", [[0], [0, 5, 17]])
def test_labeled_bfs_vs_oracle(spark, seeds):
    res = labeled_bfs(spark, edges_df(spark, G_RAND), seeds)
    assert res.converged
    got = {(r["src"], r["id"]): r["dist"] for r in res.distances.collect()}
    want = {
        (s, v): d for s in seeds for v, d in _bfs_oracle(G_RAND, s).items()
    }
    assert got == want


def test_harmonic_centrality_vs_oracle(spark):
    seeds = [0, 5, 17]
    per_src = {s: _bfs_oracle(G_RAND, s) for s in seeds}
    want = defaultdict(float)
    nsrc = defaultdict(int)
    for s, dists in per_src.items():
        for v, d in dists.items():
            if d > 0:
                want[v] += 1.0 / d
                nsrc[v] += 1
    got = {
        r["id"]: (r["harmonic"], r["n_sources"])
        for r in harmonic_centrality(spark, edges_df(spark, G_RAND), seeds).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v], abs=1e-9)
        assert got[v][1] == nsrc[v]


def test_closeness_centrality_vs_oracle(spark):
    from bitcoinpagerank_spark.operators.bfs import closeness_centrality

    seeds = [0, 5, 17]
    per_src = {s: _bfs_oracle(G_RAND, s) for s in seeds}
    sumd = defaultdict(int)
    nsrc = defaultdict(int)
    for s, dists in per_src.items():
        for v, d in dists.items():
            if d > 0:
                sumd[v] += d
                nsrc[v] += 1
    got = {
        r["id"]: (r["closeness"], r["sum_dist"], r["n_sources"])
        for r in closeness_centrality(
            spark, edges_df(spark, G_RAND), seeds
        ).collect()
    }
    assert set(got) == set(sumd)
    for v in sumd:
        assert got[v][0] == pytest.approx(nsrc[v] / sumd[v], abs=1e-9)
        assert got[v][1] == sumd[v]
        assert got[v][2] == nsrc[v]
