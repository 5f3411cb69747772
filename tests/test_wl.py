"""WL fingerprints: isomorphism invariance and python-replay oracle."""

from __future__ import annotations

from collections import Counter

import pytest

from bitcoinpagerank_spark.operators.wl import WL_A, WL_B, WL_P, wl_fingerprints
from tests.conftest import edges_df


def wl_oracle(edges, rounds=2):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    lbl = {v: len(ns) for v, ns in adj.items()}
    for _ in range(rounds):
        new = {}
        for v, ns in adj.items():
            s = 0
            for j, nlbl in enumerate(sorted(lbl[u] for u in ns), start=1):
                s += (((j * WL_B + 1) % WL_P) * nlbl) % WL_P
            new[v] = (lbl[v] * WL_A + s) % WL_P
        lbl = new
    return lbl


GRAPH = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]


def test_wl_matches_replay(spark):
    got = {r["id"]: r["fingerprint"]
           for r in wl_fingerprints(spark, edges_df(spark, GRAPH)).collect()}
    assert got == wl_oracle(GRAPH)


def test_wl_isomorphism_invariant(spark):
    perm = {1: 30, 2: 10, 3: 50, 4: 20, 5: 40}
    relabeled = [(perm[s], perm[d]) for s, d in GRAPH]
    a = Counter(r["fingerprint"] for r in
                wl_fingerprints(spark, edges_df(spark, GRAPH)).collect())
    b = Counter(r["fingerprint"] for r in
                wl_fingerprints(spark, edges_df(spark, relabeled)).collect())
    assert a == b  # fingerprint multiset is permutation-invariant


def test_wl_discriminates_structures(spark):
    path = [(i, i + 1) for i in range(1, 6)]
    star = [(1, j) for j in range(2, 7)]
    a = Counter(r["fingerprint"] for r in
                wl_fingerprints(spark, edges_df(spark, path)).collect())
    b = Counter(r["fingerprint"] for r in
                wl_fingerprints(spark, edges_df(spark, star)).collect())
    assert a != b


def test_wl_guard(spark):
    with pytest.raises(ValueError):
        wl_fingerprints(spark, edges_df(spark, GRAPH), rounds=0)
