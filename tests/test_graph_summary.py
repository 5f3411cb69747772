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
