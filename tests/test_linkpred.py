"""Link prediction + host rollup + assortativity vs brute-force oracles."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from conftest import G_CYCLE, G_STAR, G_TRI, edges_df
from bitcoinpagerank_spark.operators.linkpred import (
    adamic_adar_pairs,
    common_neighbor_pairs,
    jaccard_pairs,
    predicted_links,
)
from bitcoinpagerank_spark.operators.edges import (
    degree_assortativity,
    quotient_graph,
)

# deterministic pseudo-random graph with hubs and shared neighborhoods
G_RAND = sorted(
    {((i * 7 + 3) % 30, (i * 13 + 5) % 30) for i in range(120)}
    | {(0, j) for j in range(1, 12)}  # hub 0
)
G_RAND = [(s, d) for s, d in G_RAND if s != d]


def _nbrs(edges):
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def _pairs_oracle(edges, min_common=1, max_pivot_degree=None):
    """{(u,v): (common, jaccard, adamic_adar)} — wedge enumeration with
    the same pivot-degree cap semantics as the operator (cap drops hub
    pivots from common/aa counts; jaccard denominator stays exact)."""
    adj = _nbrs(edges)
    out = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            shared = adj[u] & adj[v]
            if max_pivot_degree is not None:
                shared = {n for n in shared if len(adj[n]) <= max_pivot_degree}
            if len(shared) >= min_common:
                jac = len(shared) / (len(adj[u]) + len(adj[v]) - len(shared))
                aa = sum(1.0 / math.log(len(adj[n])) for n in shared)
                out[(u, v)] = (len(shared), jac, aa)
    return out


@pytest.mark.parametrize("edges", [G_CYCLE, G_STAR, G_TRI, G_RAND])
def test_common_neighbors_oracle(spark, edges):
    got = {
        (r["u"], r["v"]): r["common"]
        for r in common_neighbor_pairs(edges_df(spark, edges)).collect()
    }
    want = {k: c for k, (c, _, _) in _pairs_oracle(edges).items()}
    assert got == want


def test_jaccard_and_adamic_adar_oracle(spark):
    want = _pairs_oracle(G_RAND, min_common=2)
    jac = {
        (r["u"], r["v"]): (r["common"], r["jaccard"])
        for r in jaccard_pairs(edges_df(spark, G_RAND), min_common=2).collect()
    }
    aa = {
        (r["u"], r["v"]): r["adamic_adar"]
        for r in adamic_adar_pairs(edges_df(spark, G_RAND), min_common=2).collect()
    }
    assert set(jac) == set(want) and set(aa) == set(want)
    for k, (c, j, a) in want.items():
        assert jac[k][0] == c
        assert jac[k][1] == pytest.approx(j, abs=1e-9)
        assert aa[k] == pytest.approx(a, abs=1e-9)


def test_pivot_degree_cap_semantics(spark):
    """Cap excludes hub pivots from the wedge counts exactly as the
    oracle's capped enumeration; jaccard denominators remain full-graph."""
    cap = 5
    want = _pairs_oracle(G_RAND, min_common=1, max_pivot_degree=cap)
    got = {
        (r["u"], r["v"]): (r["common"], r["jaccard"])
        for r in jaccard_pairs(
            edges_df(spark, G_RAND), min_common=1, max_pivot_degree=cap
        ).collect()
    }
    assert set(got) == set(want)
    for k, (c, j, _) in want.items():
        assert got[k] == (c, pytest.approx(j, abs=1e-9))
    # the cap must actually drop something on this hubby graph
    assert len(want) < len(_pairs_oracle(G_RAND, min_common=1))


def test_predicted_links_excludes_existing_edges(spark):
    res = predicted_links(edges_df(spark, G_RAND), min_common=2).collect()
    adj = _nbrs(G_RAND)
    want = {
        k for k in _pairs_oracle(G_RAND, min_common=2) if k[1] not in adj[k[0]]
    }
    assert {(r["u"], r["v"]) for r in res} == want
    assert all(r["jaccard"] > 0 and r["adamic_adar"] > 0 for r in res)


def test_quotient_graph_oracle(spark):
    edges = G_RAND
    grp = lambda x: x % 4  # noqa: E731
    mapping = spark.createDataFrame(
        [(n, f"g{grp(n)}") for n in range(30)], "id long, grp string"
    )
    want = defaultdict(int)
    seen = {(s, d) for s, d in edges if s != d}
    for s, d in seen:
        want[(f"g{grp(s)}", f"g{grp(d)}")] += 1
    got = {
        (r["src_grp"], r["dst_grp"]): r["weight"]
        for r in quotient_graph(edges_df(spark, edges), mapping).collect()
    }
    assert got == dict(want)
    got_x = quotient_graph(edges_df(spark, edges), mapping, keep_internal=False)
    assert {
        (r["src_grp"], r["dst_grp"]) for r in got_x.collect()
    } == {k for k in want if k[0] != k[1]}


def test_assortativity_oracle(spark):
    adj = _nbrs(G_RAND)
    xs, ys = [], []
    for u, ns in adj.items():
        for v in ns:  # symmetric view: every ordered pair once
            xs.append(len(adj[u]))
            ys.append(len(adj[v]))
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs) / n)
    sy = math.sqrt(sum((y - my) ** 2 for y in ys) / n)
    want = cov / (sx * sy)
    got = degree_assortativity(edges_df(spark, G_RAND)).collect()[0][0]
    assert got == pytest.approx(want, abs=1e-9)
    # star graph: degree-1 leaves only connect to the hub → perfectly
    # disassortative
    star = degree_assortativity(edges_df(spark, G_STAR)).collect()[0][0]
    assert star == pytest.approx(-1.0, abs=1e-9)
