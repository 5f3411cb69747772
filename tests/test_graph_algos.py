from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import G_CYCLE, G_LINE, G_STAR, G_TRI, G_TWO_CC, edges_df
from oracles import components_oracle, lpa_oracle, triangles_oracle

from bitcoinpagerank_spark.operators.components import connected_components
from bitcoinpagerank_spark.operators.labelprop import label_propagation
from bitcoinpagerank_spark.operators.triangles import (
    triangle_count,
    triangle_count_per_vertex,
)

GRAPHS = {
    "line": G_LINE,
    "cycle": G_CYCLE,
    "star": G_STAR,
    "tri": G_TRI,
    "two_cc": G_TWO_CC,
}


def _random_edges(seed, n=60, p=0.04):
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    return [(int(i), int(j)) for i, j in zip(*mask.nonzero())]


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_components_exact(spark, name):
    edges = GRAPHS[name]
    res = connected_components(spark, edges_df(spark, edges))
    assert res.converged
    got = {r["id"]: r["component"] for r in res.labels.collect()}
    assert got == components_oracle(edges)


def test_components_random(spark):
    edges = _random_edges(3)
    res = connected_components(spark, edges_df(spark, edges))
    assert res.converged
    got = {r["id"]: r["component"] for r in res.labels.collect()}
    want = components_oracle(edges)
    assert got == want
    assert res.num_components() == len(set(want.values()))


def test_components_path_graph_logarithmic_rounds(spark):
    """Star contraction must converge in O(log n) rounds on a long path —
    the case that kills diameter-bound min-label exchange (10k-vertex
    path = 10k label-exchange rounds; large-star/small-star needs ~log2)."""
    import math

    n = 10_000
    edges = [(i, i + 1) for i in range(1, n)]
    res = connected_components(spark, edges_df(spark, edges), max_iter=40)
    assert res.converged
    assert res.iterations <= 2 * math.ceil(math.log2(n))
    assert res.num_components() == 1
    # every vertex labelled with the component minimum
    assert res.labels.where(F.col("component") != 1).count() == 0


def test_two_cc_labels(spark):
    res = connected_components(spark, edges_df(spark, G_TWO_CC))
    got = {r["id"]: r["component"] for r in res.labels.collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_triangles_exact(spark, name):
    edges = GRAPHS[name]
    assert triangle_count(edges_df(spark, edges)) == triangles_oracle(edges)


def test_triangles_random(spark):
    edges = _random_edges(11, n=40, p=0.15)
    assert triangle_count(edges_df(spark, edges)) == triangles_oracle(edges)


def test_triangles_per_vertex(spark):
    # g_tri: one triangle → every vertex participates once
    per_v = {
        r["id"]: r["triangles"]
        for r in triangle_count_per_vertex(edges_df(spark, G_TRI)).collect()
    }
    assert per_v == {1: 1, 2: 1, 3: 1}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_labelprop_matches_oracle(spark, name):
    edges = GRAPHS[name]
    res = label_propagation(spark, edges_df(spark, edges), max_iter=10)
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got == lpa_oracle(edges, max_iter=10)


def test_labelprop_random(spark):
    edges = _random_edges(5, n=40, p=0.08)
    res = label_propagation(spark, edges_df(spark, edges), max_iter=6)
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got == lpa_oracle(edges, max_iter=6)


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_random_matches_peel_oracle(spark, k):
    from oracles import kcore_oracle

    from bitcoinpagerank_spark.operators.kcore import k_core

    edges = _random_edges(9, n=50, p=0.08)
    res = k_core(spark, edges_df(spark, edges), k=k)
    assert res.converged
    got = {r["id"]: r["degree"] for r in res.vertices.collect()}
    assert got == kcore_oracle(edges, k)


def test_kcore_triangle_plus_tail(spark):
    from bitcoinpagerank_spark.operators.kcore import k_core

    # triangle {1,2,3} with a tail 3-4-5: 2-core = the triangle only
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    res = k_core(spark, edges_df(spark, edges), k=2)
    got = {r["id"]: r["degree"] for r in res.vertices.collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    empty = k_core(spark, edges_df(spark, edges), k=3)
    assert empty.converged and empty.vertices.count() == 0


def test_core_numbers_match_peel_oracle(spark):
    from oracles import coreness_oracle

    from bitcoinpagerank_spark.operators.kcore import core_numbers

    for seed, n, p in [(9, 50, 0.08), (13, 60, 0.05)]:
        edges = _random_edges(seed, n=n, p=p)
        res = core_numbers(spark, edges_df(spark, edges))
        assert res.converged
        got = {r["id"]: r["degree"] for r in res.vertices.collect()}
        assert got == coreness_oracle(edges), f"seed={seed}"


def test_core_numbers_triangle_plus_tail(spark):
    from bitcoinpagerank_spark.operators.kcore import core_numbers

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    res = core_numbers(spark, edges_df(spark, edges))
    got = {r["id"]: r["degree"] for r in res.vertices.collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1}


def test_iterative_loops_record_shuffle_bytes(spark):
    """Per-iteration lineage parity across the iterate loops: WCC, LPA,
    k-core, coreness, and HITS metrics all carry the iteration's shuffle
    read/write bytes (every round shuffles at least its aggregate)."""
    from bitcoinpagerank_spark.operators.components import connected_components
    from bitcoinpagerank_spark.operators.labelprop import label_propagation
    from bitcoinpagerank_spark.operators.kcore import core_numbers, k_core
    from bitcoinpagerank_spark.operators.hits import hits

    e = edges_df(spark, G_TWO_CC)
    results = [
        connected_components(spark, e).metrics,
        label_propagation(spark, e, max_iter=2).metrics,
        k_core(spark, e, k=2).metrics,
        core_numbers(spark, e).metrics,
        hits(spark, e, max_iter=2).metrics,
    ]
    for metrics in results:
        assert metrics, "loop recorded no iterations"
        for m in metrics:
            assert "shuffle_write_bytes" in m and "shuffle_read_bytes" in m
        assert any(m["shuffle_write_bytes"] > 0 for m in metrics), metrics


def test_bfs_distances_vs_python(spark):
    """Frontier-expansion BFS matches a Python BFS oracle on hop counts;
    unreachable vertices absent; rounds == eccentricity + 1."""
    from collections import deque
    from bitcoinpagerank_spark.operators.bfs import bfs_distances

    edges = [(1, 2), (2, 3), (3, 4), (4, 2), (1, 5), (5, 6), (7, 1), (8, 9)]
    e = edges_df(spark, edges)
    res = bfs_distances(spark, e, sources=[1])
    got = {r["id"]: r["dist"] for r in res.distances.collect()}

    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    want = {1: 0}
    dq = deque([1])
    while dq:
        u = dq.popleft()
        for v in adj.get(u, []):
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    assert got == want
    assert res.converged
    # 7, 8, 9 unreachable along edge direction
    assert 7 not in got and 8 not in got
    # multi-source: seeds at distance 0
    res2 = bfs_distances(spark, e, sources=[1, 8])
    got2 = {r["id"]: r["dist"] for r in res2.distances.collect()}
    assert got2[8] == 0 and got2[9] == 1 and got2[1] == 0
    # lineage rows present
    assert all("shuffle_write_bytes" in m for m in res.metrics)
