"""In-process oracles (the role of the reference's SequentialPageRank.java:23-103
JUNG oracle): numpy dense power iteration, union-find components, synchronous
LPA fixpoint, brute-force triangle enumeration."""

from __future__ import annotations

from collections import Counter

import numpy as np

ALPHA = 0.15


def pagerank_oracle(
    edges: list[tuple[int, int]],
    alpha: float = ALPHA,
    tol: float = 1e-12,
    max_iter: int = 10_000,
) -> dict[int, float]:
    """Dense power iteration with the exact §2.12 semantics:
    r' = α/N + (1-α)(Pᵀ r + missing/N), missing = Σ over dangling r."""
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        recv = np.zeros(n)
        missing = 0.0
        for v in nodes:
            i = idx[v]
            nbrs = out.get(v)
            if not nbrs:
                missing += r[i]
            else:
                share = r[i] / len(nbrs)
                for d in nbrs:
                    recv[idx[d]] += share
        new = alpha / n + (1 - alpha) * (recv + missing / n)
        if np.abs(new - r).sum() <= tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in nodes}


def components_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component label = min vertex id in the component
    (undirected view)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for s, d in edges:
        union(s, d)
    nodes = {v for e in edges for v in e}
    comp_min: dict[int, int] = {}
    for v in nodes:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in nodes}


def triangles_oracle(edges: list[tuple[int, int]]) -> int:
    """Brute-force triangle count on the undirected simple graph."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    count = 0
    for i, a in enumerate(nodes):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    count += 1
    return count


def lpa_oracle(
    edges: list[tuple[int, int]], max_iter: int = 10
) -> dict[int, int]:
    """Synchronous label propagation: each vertex adopts the most frequent
    neighbor label, ties → min label; undirected view; fixed max iters."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    labels = {v: v for v in adj}
    for _ in range(max_iter):
        new = {}
        changed = False
        for v in adj:
            counts = Counter(labels[u] for u in adj[v])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[v] = best
            changed |= best != labels[v]
        labels = new
        if not changed:
            break
    return labels


def ppr_oracle(
    edges: list[tuple[int, int]],
    sources: set[int],
    alpha: float = ALPHA,
    tol: float = 1e-12,
    max_iter: int = 10_000,
) -> dict[int, float]:
    """Personalized PageRank: teleport AND dangling mass go to the source
    set uniformly. r' = α·t + (1-α)(Pᵀr + missing·t)."""
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    src = sorted(set(sources) & set(nodes))
    assert src, "no source in graph"
    tp = np.zeros(n)
    for s in src:
        tp[idx[s]] = 1.0 / len(src)
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    r = tp.copy()
    for _ in range(max_iter):
        recv = np.zeros(n)
        missing = 0.0
        for v in nodes:
            i = idx[v]
            nbrs = out.get(v)
            if not nbrs:
                missing += r[i]
            else:
                share = r[i] / len(nbrs)
                for d in nbrs:
                    recv[idx[d]] += share
        new = alpha * tp + (1 - alpha) * (recv + missing * tp)
        if np.abs(new - r).sum() <= tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in nodes}


def kcore_oracle(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Iterative peel on the undirected simple graph → {id: core degree}."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v: len(nb) for v, nb in adj.items() if len(nb) >= k}


def coreness_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Exact coreness by sequential peeling (min-degree removal)."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    core: dict[int, int] = {}
    k = 0
    while adj:
        v = min(adj, key=lambda x: len(adj[x]))
        k = max(k, len(adj[v]))
        core[v] = k
        for u in adj[v]:
            adj[u].discard(v)
        del adj[v]
    return core
