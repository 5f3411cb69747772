"""Reciprocity and global transitivity on hand graphs."""

from __future__ import annotations

import pytest

from bitcoinpagerank_spark.operators.edges import reciprocity
from bitcoinpagerank_spark.operators.triangles import global_transitivity
from tests.conftest import G_CYCLE, G_LINE, G_TRI, edges_df


@pytest.mark.parametrize(
    "edges,want_recip,want_total",
    [
        (G_TRI, 6, 6),       # fully bidirectional triangle
        (G_LINE, 0, 2),      # pure chain, no reverses
        (G_CYCLE, 0, 3),     # directed 3-cycle, no reverses
        ([(1, 2), (2, 1), (2, 3)], 2, 3),  # one reciprocal pair
    ],
)
def test_reciprocity(spark, edges, want_recip, want_total):
    row = reciprocity(edges_df(spark, edges)).collect()[0]
    assert row["reciprocal_edges"] == want_recip
    assert row["total_edges"] == want_total
    assert row["reciprocity"] == pytest.approx(want_recip / want_total)


@pytest.mark.parametrize(
    "edges,want_tri,want_wedges,want_t",
    [
        (G_TRI, 1, 3, 1.0),    # undirected triangle
        (G_CYCLE, 1, 3, 1.0),  # directed cycle → same undirected triangle
        (G_LINE, 0, 1, 0.0),   # path: one wedge, no triangle
        # triangle with a pendant: wedges = 3 (triangle) + C(3,2)=3 at hub
        ([(1, 2), (2, 3), (3, 1), (3, 4)], 1, 5, 0.6),
    ],
)
def test_transitivity(spark, edges, want_tri, want_wedges, want_t):
    row = global_transitivity(edges_df(spark, edges)).collect()[0]
    assert row["n_triangles"] == want_tri
    assert row["n_wedges"] == want_wedges
    assert row["transitivity"] == pytest.approx(want_t)


def test_eccentricity_and_effective_diameter(spark):
    from bitcoinpagerank_spark.operators.bfs import (
        eccentricity_sample,
        effective_diameter,
    )

    df = edges_df(spark, G_LINE)  # 1->2->3
    ecc = {r["src"]: (r["eccentricity"], r["n_reached"])
           for r in eccentricity_sample(spark, df, [1, 2, 3]).collect()}
    assert ecc == {1: (2, 2), 2: (1, 1), 3: (0, 0)}
    row = effective_diameter(spark, df, [1, 2, 3], q=0.9).collect()[0]
    # samples: d(1,2)=1, d(1,3)=2, d(2,3)=1 -> p90 of [1,1,2] = 1.8
    assert row["n_pairs"] == 3
    assert row["diameter_lb"] == 2
    assert row["effective_diameter"] == pytest.approx(1.8)


def test_rectangle_count(spark):
    from bitcoinpagerank_spark.operators.triangles import rectangle_count

    square = edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    row = rectangle_count(square).collect()[0]
    assert row["n_wedge_pairs"] == 2 and row["n_rectangles"] == 1
    tri = edges_df(spark, G_CYCLE)
    row = rectangle_count(tri).collect()[0]
    assert row["n_rectangles"] == 0
    # K4 contains 3 distinct 4-cycles
    k4 = edges_df(spark, [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b])
    assert rectangle_count(k4).collect()[0]["n_rectangles"] == 3


def test_rectangle_count_max_wedge_degree(spark):
    """The degree cap drops hub midpoints before the Σ deg² wedge join:
    capped count on (square ∪ hub) == exact count with the hub excluded."""
    from bitcoinpagerank_spark.operators.triangles import rectangle_count

    square = [(1, 2), (2, 3), (3, 4), (4, 1)]
    hub = 99  # degree-8 hub: wedges through it pair every corner
    hub_edges = [(hub, v) for v in range(1, 9)]
    g = edges_df(spark, square + hub_edges)

    exact = rectangle_count(g).collect()[0]
    # hub closes extra rectangles (e.g. 1-99-3 pairs with 1-2-3)
    assert exact["n_rectangles"] > 1

    capped = rectangle_count(g, max_wedge_degree=4).collect()[0]
    no_hub = rectangle_count(edges_df(spark, square)).collect()[0]
    assert capped["n_rectangles"] == no_hub["n_rectangles"] == 1
    assert capped["n_wedge_pairs"] == no_hub["n_wedge_pairs"]

    # a cap above the max degree is a no-op (exact)
    uncapped = rectangle_count(g, max_wedge_degree=1000).collect()[0]
    assert uncapped["n_rectangles"] == exact["n_rectangles"]


def test_louvain_move_round_star(spark):
    from bitcoinpagerank_spark.operators.community import louvain_move_round
    from tests.conftest import G_STAR

    rows = {r["id"]: r for r in
            louvain_move_round(spark, edges_df(spark, G_STAR)).collect()}
    # leaves (deg 1) join the hub's community: 1*4 < 2m=8
    for leaf in (2, 3, 4, 5):
        assert rows[leaf]["moved"] and rows[leaf]["community"] == 1
        assert rows[leaf]["delta_q"] == pytest.approx((1 - 4 / 8) / 4)
    # the hub moves toward its min-degree (min-id) neighbor — chains are
    # expected in the synchronous phase
    assert rows[1]["moved"] and rows[1]["community"] == 2


def test_skipgram_negatives_contract(spark):
    from bitcoinpagerank_spark.operators.walks import skipgram_negatives

    df = edges_df(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    rows = skipgram_negatives(spark, df, k=3).collect()
    verts = {1, 2, 3, 4}
    per_center: dict[int, set[int]] = {}
    for r in rows:
        assert r["neg"] in verts  # dense-rank draw: only real vertices
        per_center.setdefault(r["center"], set()).add(r["j"])
    # EVERY vertex gets exactly k negatives (j = 0..k-1) — the dense-rank
    # guarantee a raw-id draw cannot make on sparse id spaces
    assert set(per_center) == verts
    for js in per_center.values():
        assert js == {0, 1, 2}
    # deterministic
    again = skipgram_negatives(spark, df, k=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_skipgram_negatives_sparse_hashed_ids(spark):
    """The r03 advice case: sparse/hashed 64-bit ids. A raw-id LCG draw
    would miss the vertex set almost always and overflow int64; the
    dense-rank draw still yields exactly k real negatives per vertex."""
    from bitcoinpagerank_spark.operators.walks import skipgram_negatives

    big = [(6148914691236517205, -4611686018427387904),
           (-4611686018427387904, 8070450532247928832),
           (8070450532247928832, 6148914691236517205)]
    rows = skipgram_negatives(spark, edges_df(spark, big), k=2).collect()
    verts = {v for e in big for v in e}
    per_center = {}
    for r in rows:
        assert r["neg"] in verts
        per_center.setdefault(r["center"], []).append(r["j"])
    assert set(per_center) == verts
    assert all(sorted(js) == [0, 1] for js in per_center.values())
