"""Single-level synchronous Louvain vs an exact python replay, plus
structural sanity (two cliques separate; modularity improves)."""

from __future__ import annotations

import pytest

from bitcoinpagerank_spark.operators.community import louvain_communities
from tests.conftest import edges_df


def louvain_replay(edges, max_rounds=10):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    k = {v: len(ns) for v, ns in adj.items()}
    m = sum(k.values()) // 2
    comm = {v: v for v in adj}
    prev_moved = None
    for r in range(max_rounds):
        new = {}
        moved = 0
        for v, ns in adj.items():
            if (v + r) % 2 != 0:
                new[v] = comm[v]
                continue
            kic: dict[int, int] = {}
            for u in ns:
                kic[comm[u]] = kic.get(comm[u], 0) + 1
            ctot: dict[int, int] = {}
            for u in adj:
                ctot[comm[u]] = ctot.get(comm[u], 0) + k[u]
            cands = set(kic) | {comm[v]}
            best = None
            for c in sorted(cands):
                sigma = ctot.get(c, 0) - (k[v] if c == comm[v] else 0)
                score2 = 2 * m * kic.get(c, 0) - k[v] * sigma
                key = (-score2, 0 if c == comm[v] else 1, c)
                if best is None or key < best[0]:
                    best = (key, c)
            new[v] = best[1]
            if new[v] != comm[v]:
                moved += 1
        comm = new
        if moved == 0 and prev_moved == 0:
            break
        prev_moved = moved
    return comm


def modularity(edges, comm):
    adj = set()
    deg: dict[int, int] = {}
    for s, d in edges:
        if s != d:
            e = (min(s, d), max(s, d))
            if e not in adj:
                adj.add(e)
                deg[s] = deg.get(s, 0) + 1
                deg[d] = deg.get(d, 0) + 1
    m = len(adj)
    q = 0.0
    for a, b in adj:
        if comm[a] == comm[b]:
            q += 1.0 / m
    for v in deg:
        for u in deg:
            if comm[v] == comm[u]:
                q -= deg[v] * deg[u] / (4.0 * m * m)
    return q


TWO_CLIQUES = (
    [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
    + [(a, b) for a in (7, 8, 9) for b in (7, 8, 9) if a < b]
    + [(3, 7)]  # one bridge
)


@pytest.mark.parametrize(
    "edges",
    [TWO_CLIQUES, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],
     [(1, 2), (1, 3), (1, 4), (1, 5)]],
    ids=["two_cliques", "path", "star"],
)
def test_louvain_matches_replay(spark, edges):
    res = louvain_communities(spark, edges_df(spark, edges))
    got = {r["id"]: r["community"] for r in res.communities.collect()}
    assert got == louvain_replay(edges)


def test_louvain_separates_cliques(spark):
    res = louvain_communities(spark, edges_df(spark, TWO_CLIQUES))
    comm = {r["id"]: r["community"] for r in res.communities.collect()}
    # each triangle ends in one community; the bridge does not merge them
    assert comm[1] == comm[2] == comm[3]
    assert comm[7] == comm[8] == comm[9]
    assert comm[1] != comm[7]
    # and the partition beats singletons on modularity
    assert modularity(TWO_CLIQUES, comm) > modularity(
        TWO_CLIQUES, {v: v for v in comm}
    )
