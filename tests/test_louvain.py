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


def weighted_move_replay(und, max_rounds=10):
    """Python replay of community._weighted_move_loop over a canonical
    weighted edge dict {(a<=b): w}; self-loops count twice in degrees and
    are excluded from k_{i,c} (they move with the vertex)."""
    adj: dict[int, dict[int, int]] = {}
    k: dict[int, int] = {}
    for (a, b), w in und.items():
        if a == b:
            k[a] = k.get(a, 0) + 2 * w
            adj.setdefault(a, {})
            continue
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
        k[a] = k.get(a, 0) + w
        k[b] = k.get(b, 0) + w
    m = sum(k.values()) // 2
    comm = {v: v for v in k}
    prev_moved = None
    for r in range(max_rounds):
        ctot: dict[int, int] = {}
        for u in k:
            ctot[comm[u]] = ctot.get(comm[u], 0) + k[u]
        new = {}
        moved = 0
        for v in k:
            if (v + r) % 2 != 0:
                new[v] = comm[v]
                continue
            kic: dict[int, int] = {}
            for u, w in adj.get(v, {}).items():
                kic[comm[u]] = kic.get(comm[u], 0) + w
            best = None
            for c in sorted(set(kic) | {comm[v]}):
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


def louvain_levels_replay(edges, max_levels=5, max_rounds=10):
    """Python replay of community.louvain_levels: move loop → contract
    (weights = underlying edge counts, intra edges → self-loops) → repeat."""
    und: dict[tuple[int, int], int] = {}
    for s, d in edges:
        if s == d:
            continue
        und[(min(s, d), max(s, d))] = 1
    mapping = {v: v for e in und for v in e}
    for _level in range(max_levels):
        comm = weighted_move_replay(und, max_rounds)
        n_comm = len(set(comm.values()))
        if n_comm == len(comm):
            mapping = {v: comm[g] for v, g in mapping.items()}
            break
        mapping = {v: comm[g] for v, g in mapping.items()}
        contracted: dict[tuple[int, int], int] = {}
        for (a, b), w in und.items():
            ca, cb = comm[a], comm[b]
            key = (min(ca, cb), max(ca, cb))
            contracted[key] = contracted.get(key, 0) + w
        und = contracted
    return mapping


@pytest.mark.parametrize(
    "edges",
    [TWO_CLIQUES, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],
     [(1, 2), (1, 3), (1, 4), (1, 5)]],
    ids=["two_cliques", "path", "star"],
)
def test_louvain_levels_matches_replay(spark, edges):
    from bitcoinpagerank_spark.operators.community import louvain_levels

    res = louvain_levels(spark, edges_df(spark, edges), max_levels=2)
    got = {r["id"]: r["community"] for r in res.communities.collect()}
    assert got == louvain_levels_replay(edges, max_levels=2)


def test_louvain_levels_hierarchy_properties(spark):
    """Modularity is non-decreasing level over level; the two-clique
    fixture ends with each clique in one community, cliques separate."""
    from bitcoinpagerank_spark.operators.community import louvain_levels

    res = louvain_levels(spark, edges_df(spark, TWO_CLIQUES), max_levels=4)
    qs = [mt["modularity"] for mt in res.level_metrics]
    assert all(b >= a - 1e-12 for a, b in zip(qs, qs[1:])), qs
    comm = {r["id"]: r["community"] for r in res.communities.collect()}
    assert comm[1] == comm[2] == comm[3]
    assert comm[7] == comm[8] == comm[9]
    assert comm[1] != comm[7]
    # the hierarchy's final partition is at least as good as singletons
    assert modularity(TWO_CLIQUES, comm) > modularity(
        TWO_CLIQUES, {v: v for v in comm}
    )
    # level sizes shrink monotonically
    sizes = [mt["n_vertices"] for mt in res.level_metrics]
    assert sizes == sorted(sizes, reverse=True)


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


def test_louvain_empty_edge_set(spark):
    # ADVICE r4 #1: F.sum over an empty symmetric edge set is NULL; the
    # move loop must treat it as m=0 instead of raising TypeError
    empty = spark.createDataFrame([], "src_id long, dst_id long")
    res = louvain_communities(spark, empty, max_rounds=2)
    assert res.communities.count() == 0
    assert res.converged


def test_louvain_self_loop_only(spark):
    res = louvain_communities(spark, edges_df(spark, [(1, 1)]), max_rounds=2)
    assert res.communities.count() == 0
