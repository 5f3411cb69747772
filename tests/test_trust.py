"""TrustRank / spam mass / inverse-PageRank seed selection semantics
(Gyöngyi et al. 2004/2006) on hand graphs."""

from __future__ import annotations

from bitcoinpagerank_spark.operators.trust import (
    inverse_pagerank_seeds,
    spam_mass,
    trustrank,
)
from tests.conftest import edges_df


def test_trustrank_mass_conserved_and_seed_biased(spark):
    # seed 1 endorses 2; spam cluster 10<->11 has no trust inflow
    edges = edges_df(spark, [(1, 2), (2, 1), (10, 11), (11, 10)])
    seeds = [1]
    res = trustrank(spark, edges, seeds, tol=1e-12, max_iter=60)
    scores = {r["id"]: r["score"] for r in res.ranks.collect()}
    assert abs(sum(scores.values()) - 1.0) < 1e-9
    assert scores[1] > scores[2] > 0
    assert scores[10] == 0.0 and scores[11] == 0.0


def test_spam_mass_flags_unendorsed_cluster(spark):
    edges = edges_df(spark, [(1, 2), (2, 1), (10, 11), (11, 10)])
    rows = {r["id"]: r for r in spam_mass(spark, edges, [1],
                                          tol=1e-12, max_iter=60).collect()}
    # spam cluster: ALL its PageRank is untrusted
    assert rows[10]["spam_mass"] == 1.0 and rows[11]["spam_mass"] == 1.0
    # seed-backed pages: trust flow covers (here exceeds) their rank
    assert rows[1]["spam_mass"] < 0.5 and rows[2]["spam_mass"] < 0.5
    assert rows[1]["trustrank"] > rows[1]["pagerank"]


def test_inverse_pagerank_seeds_prefers_wide_reach(spark):
    # 1 reaches everything; 5 is a sink. On the reversed graph 1 collects
    # all inbound trust-coverage mass.
    edges = edges_df(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)])
    top = inverse_pagerank_seeds(spark, edges, k=3, tol=1e-12, max_iter=60)
    rows = top.orderBy("rank").collect()
    assert rows[0]["id"] == 1
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert rows[0]["score"] >= rows[1]["score"] >= rows[2]["score"]
