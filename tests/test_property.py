"""Property-based checks (hypothesis) for the newest operators.

Each example pays a full Spark job, so example counts are small and
deadlines disabled — these hunt structural edge cases (duplicate
timestamps, empty keys, disconnected graphs), not statistical coverage.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def asof_brute(left, right):
    """Brute-force as-of: latest right (t_r <= t_l) per key, ties by
    the unique right time (right is pre-deduped per (key, time))."""
    out = {}
    for eid, k, t in left:
        best = None
        for rk, rt, v in right:
            if rk == k and rt <= t and (best is None or rt > best[0]):
                best = (rt, v)
        out[eid] = best[1] if best else None
    return out


@SET
@given(
    left=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 3), st.integers(0, 20)),
        min_size=1, max_size=12, unique_by=lambda x: x[0],
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)),
        min_size=0, max_size=10, unique=True,
    ),
)
def test_as_of_join_matches_brute_force(spark, left, right):
    from bitcoinpagerank_spark.plans.joins import as_of_join

    rvals = [(k, t, f"v{k}_{t}") for k, t in right]
    ldf = spark.createDataFrame(left, "eid long, k long, t long")
    rdf = spark.createDataFrame(
        rvals or [(99, 99, "x")], "k long, t long, v string"
    )
    if not rvals:
        rdf = rdf.where("k < 0")  # empty right side
    got = {r["eid"]: r["v"]
           for r in as_of_join(ldf, rdf, ["k"], ["k"], "t", "t").collect()}
    assert got == asof_brute(left, rvals)


@SET
@given(
    edges=st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12)),
        min_size=1, max_size=25,
    ).filter(lambda es: any(s != d for s, d in es)),
)
def test_mis_always_independent_and_maximal(spark, edges):
    from bitcoinpagerank_spark.operators.mis import maximal_independent_set

    df = spark.createDataFrame(edges, "src_id long, dst_id long")
    res = maximal_independent_set(spark, df)
    assert res.converged
    status = {r["id"]: r["status"] for r in res.labels.collect()}
    mis = {v for v, s in status.items() if s == "mis"}
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    for v, ns in adj.items():
        if v in mis:
            assert not (ns & mis), (v, ns & mis)
        else:
            assert ns & mis, v


@SET
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=30, unique_by=lambda x: x[0],
    ),
    pcts=st.tuples(st.integers(0, 100), st.integers(0, 100)),
)
def test_stratified_sample_respects_predicate(spark, rows, pcts):
    from bitcoinpagerank_spark.operators.sampling import (
        sample_bucket,
        stratified_sample,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"a": pcts[0], "b": pcts[1]}
    out = stratified_sample(df, "doc_id", "lang", rates, default_pct=0)
    got = {r["doc_id"] for r in out.collect()}
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", sample_bucket(F.col("doc_id")).alias("b")).collect()
    }
    want = {
        i for i, lang in rows
        if buckets[i] < rates.get(lang, 0)
    }
    assert got == want
