"""Neighbor feature aggregation vs a numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import edges_df
from bitcoinpagerank_spark.operators.graphagg import (
    neighbor_feature_mean,
    neighbor_feature_mean_hops,
)

EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (1, 3), (4, 2)]
DIM = 5


def _feats(spark, n=5):
    rng = [(i, [float((i * 7 + j * 3) % 11) for j in range(DIM)]) for i in range(n)]
    return (
        spark.createDataFrame(rng, "vec_id long, embedding array<double>"),
        {i: np.array(v) for i, v in rng},
    )


def _mean_oracle(edges, fm, direction):
    agg = {}
    for s, d in edges:
        v, nbr = (d, s) if direction == "in" else (s, d)
        if nbr in fm:  # inner-join semantics: featureless neighbors drop
            agg.setdefault(v, []).append(fm[nbr])
    return {v: (len(xs), np.mean(xs, axis=0)) for v, xs in agg.items()}


@pytest.mark.parametrize("direction", ["in", "out"])
def test_neighbor_mean_vs_numpy(spark, direction):
    feats, fm = _feats(spark)
    res = neighbor_feature_mean(
        edges_df(spark, EDGES), feats, dim=DIM, direction=direction
    ).collect()
    want = _mean_oracle(EDGES, fm, direction)
    assert {r["id"] for r in res} == set(want)
    for r in res:
        n, vec = want[r["id"]]
        assert r["n_nbrs"] == n
        assert np.allclose(r["nbr_mean"], vec, atol=1e-12)


def test_neighbor_mean_hops_matches_iterated_oracle(spark):
    feats, fm = _feats(spark)
    cur = fm
    for _ in range(2):
        step = _mean_oracle(EDGES, cur, "in")
        cur = {v: vec for v, (n, vec) in step.items()}
    res = neighbor_feature_mean_hops(
        edges_df(spark, EDGES), feats, dim=DIM, hops=2
    ).collect()
    # hop-2 only defined where hop-1 neighbors had features
    for r in res:
        if r["id"] in cur:
            assert np.allclose(r["nbr_mean"], cur[r["id"]], atol=1e-12)


def test_direction_validation(spark):
    feats, _ = _feats(spark)
    with pytest.raises(ValueError):
        neighbor_feature_mean(edges_df(spark, EDGES), feats, dim=DIM,
                              direction="sideways")
