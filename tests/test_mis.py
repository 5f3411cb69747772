"""Luby MIS: independence, maximality, determinism, and python-replay
oracle on hand graphs."""

from __future__ import annotations

import pytest

from bitcoinpagerank_spark.operators.mis import (
    MIS_A,
    MIS_B,
    MIS_C,
    MIS_M,
    maximal_independent_set,
)
from tests.conftest import G_CYCLE, G_LINE, G_STAR, G_TRI, edges_df

GRAPHS = {
    "line": G_LINE, "cycle": G_CYCLE, "star": G_STAR, "tri": G_TRI,
    "two_cc": [(1, 2), (2, 1), (3, 4)],
    "path8": [(i, i + 1) for i in range(1, 8)],
}


def mis_oracle(edges, max_rounds=30):
    """Sequential replay of the exact distributed contract."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    active = set(adj)
    mis: set[int] = set()
    for r in range(max_rounds):
        if not active:
            break
        key = {
            v: ((v * MIS_A + r * MIS_B + MIS_C) % MIS_M, v) for v in active
        }
        winners = {
            v for v in active
            if all(key[v] < key[u] for u in adj[v] if u in active)
        }
        removed = set(winners)
        for v in winners:
            removed |= adj[v] & active
        mis |= winners
        active -= removed
    return mis, active


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_mis_matches_replay_and_is_maximal(spark, gname):
    edges = GRAPHS[gname]
    res = maximal_independent_set(spark, edges_df(spark, edges))
    assert res.converged
    status = {r["id"]: r["status"] for r in res.labels.collect()}
    want_mis, want_active = mis_oracle(edges)
    assert not want_active
    assert {v for v, s in status.items() if s == "mis"} == want_mis
    assert "active" not in status.values()
    # independence + maximality, independently of the replay
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    mis = want_mis
    for s, d in edges:
        assert not (s in mis and d in mis and s != d), (gname, s, d)
    for v in adj:
        assert v in mis or adj[v] & mis, (gname, v)


def test_mis_deterministic(spark):
    df = edges_df(spark, GRAPHS["path8"])
    a = {r["id"]: r["status"]
         for r in maximal_independent_set(spark, df).labels.collect()}
    b = {r["id"]: r["status"]
         for r in maximal_independent_set(spark, df).labels.collect()}
    assert a == b


def test_mis_guards(spark):
    empty = spark.createDataFrame([], "src_id long, dst_id long")
    with pytest.raises(ValueError):
        maximal_independent_set(spark, empty)


@pytest.mark.parametrize("gname", ["line", "cycle", "star", "tri", "path8"])
def test_greedy_coloring_valid_and_bounded(spark, gname):
    from bitcoinpagerank_spark.operators.mis import greedy_coloring

    edges = GRAPHS[gname]
    res = greedy_coloring(spark, edges_df(spark, edges))
    assert res.converged
    colors = {r["id"]: r["color"] for r in res.colors.collect()}
    verts = {v for e in edges for v in e}
    assert set(colors) == verts  # complete assignment
    deg: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            deg.setdefault(s, set()).add(d)
            deg.setdefault(d, set()).add(s)
    for s, d in edges:
        if s != d:
            assert colors[s] != colors[d], (gname, s, d)  # proper coloring
    max_deg = max(len(v) for v in deg.values())
    assert res.n_colors <= max_deg + 1
    # deterministic
    res2 = greedy_coloring(spark, edges_df(spark, edges))
    assert colors == {r["id"]: r["color"] for r in res2.colors.collect()}


def test_greedy_coloring_truncation_emits_sentinel(spark):
    """When max_colors runs out before the residual empties, leftover
    vertices appear with color -1 — the output is always a COMPLETE
    vertex assignment, never silently partial."""
    from bitcoinpagerank_spark.operators.mis import greedy_coloring

    tri = [(1, 2), (2, 3), (3, 1)]  # needs 3 colors
    res = greedy_coloring(spark, edges_df(spark, tri), max_colors=1)
    assert not res.converged
    colors = {r["id"]: r["color"] for r in res.colors.collect()}
    assert set(colors) == {1, 2, 3}  # complete, incl. uncolored leftovers
    assert -1 in colors.values()
    # colored vertices still form a proper partial coloring
    for s, d in tri:
        if colors[s] >= 0 and colors[d] >= 0:
            assert colors[s] != colors[d]
