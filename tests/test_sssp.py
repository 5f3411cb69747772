"""Weighted SSSP vs a sequential Dijkstra oracle."""

from __future__ import annotations

import heapq

import pytest

from bitcoinpagerank_spark.operators.sssp import sssp
from tests.conftest import G_CYCLE, G_LINE, edges_df


def dijkstra_oracle(wedges, source):
    adj: dict[int, list[tuple[int, float]]] = {}
    for s, d, w in wedges:
        adj.setdefault(s, []).append((d, float(w)))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def wedges_df(spark, wedges):
    return spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in wedges],
        "src_id long, dst_id long, w double",
    )


DIAMOND = [
    # direct edge is heavier than the two-hop detour
    (1, 2, 10.0), (1, 3, 1.0), (3, 2, 2.0), (2, 4, 1.0), (5, 1, 1.0),
]


def test_sssp_prefers_cheaper_detour(spark):
    res = sssp(spark, wedges_df(spark, DIAMOND), source=1, weight_col="w")
    assert res.converged
    got = {r["id"]: r["dist"] for r in res.distances.collect()}
    want = dijkstra_oracle(DIAMOND, 1)
    assert got == pytest.approx(want)  # 2 via 3 costs 3, not 10; 5 unreachable
    assert got[2] == 3.0 and 5 not in got


def test_sssp_unit_weights_equal_bfs(spark):
    from bitcoinpagerank_spark.operators.bfs import bfs_distances

    df = edges_df(spark, G_CYCLE + G_LINE)
    res = sssp(spark, df, source=1)
    bfs = bfs_distances(spark, df, sources=[1])
    got = {r["id"]: r["dist"] for r in res.distances.collect()}
    want = {r["id"]: float(r["dist"]) for r in bfs.distances.collect()}
    assert got == want


def test_sssp_fixed_rounds_is_hop_bounded(spark):
    # path 1->2->3->4 with unit weights: after 2 rounds only <=2-edge paths
    df = edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    res = sssp(spark, df, source=1, max_rounds=2)
    got = {r["id"]: r["dist"] for r in res.distances.collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 2.0}
    assert not res.converged


def test_sssp_rejects_negative_weights(spark):
    df = wedges_df(spark, [(1, 2, -1.0)])
    with pytest.raises(ValueError):
        sssp(spark, df, source=1, weight_col="w")
