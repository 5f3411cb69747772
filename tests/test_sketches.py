"""KMV distinct sketch vs exact python replay + error bound."""

from __future__ import annotations

import pytest

from bitcoinpagerank_spark.functions.text import HASH_P
from bitcoinpagerank_spark.operators.sketches import (
    KMV_A,
    KMV_B,
    kmv_distinct,
    kmv_distinct_by_key,
)


def _kmv_oracle(vals, k):
    hs = sorted({(v * KMV_A + KMV_B) % HASH_P for v in vals})[:k]
    n, kth = len(hs), hs[-1]
    est = float(n) if n < k else (k - 1) * HASH_P / kth
    return n, kth, round(est, 6)


def test_kmv_exact_replay(spark):
    vals = [(i * i * 7 + 3) % 100_000 for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "value long")
    for k in (16, 64, 256):
        row = kmv_distinct(df, k=k).collect()[0]
        assert (row["n_hashes"], row["kth_min"], row["est_distinct"]) == _kmv_oracle(
            vals, k
        )


def test_kmv_error_bound_and_small_set_exactness(spark):
    true_d = len({(i * i * 7 + 3) % 100_000 for i in range(5000)})
    df = spark.createDataFrame(
        [((i * i * 7 + 3) % 100_000,) for i in range(5000)], "value long"
    )
    est = kmv_distinct(df, k=256).collect()[0]["est_distinct"]
    # standard ~1/sqrt(k) relative error; allow 4 sigma
    assert abs(est - true_d) / true_d < 4 / (256 ** 0.5)
    # fewer distinct values than k -> sketch is exact
    small = spark.createDataFrame([(v % 37,) for v in range(1000)], "value long")
    row = kmv_distinct(small, k=256).collect()[0]
    assert row["n_hashes"] == 37 and row["est_distinct"] == 37.0


def test_kmv_by_key_matches_per_key_oracle(spark):
    rows = [(f"k{v % 3}", (v * 13 + 1) % 50_000) for v in range(3000)]
    df = spark.createDataFrame(rows, "key string, value long")
    got = {
        r["key"]: (r["n_hashes"], r["kth_min"], r["est_distinct"])
        for r in kmv_distinct_by_key(df, "key", k=64).collect()
    }
    for key in ("k0", "k1", "k2"):
        vals = [v for kk, v in rows if kk == key]
        assert got[key] == _kmv_oracle(vals, 64)


def test_kmv_merge_property(spark):
    """k minima of a union == k minima of the merged minima sets."""
    a = [(i * 31 + 7) % 90_001 for i in range(2000)]
    b = [(i * 17 + 5) % 90_001 for i in range(2000)]
    k = 64
    ha = sorted({(v * KMV_A + KMV_B) % HASH_P for v in a})[:k]
    hb = sorted({(v * KMV_A + KMV_B) % HASH_P for v in b})[:k]
    merged = sorted(set(ha) | set(hb))[:k]
    df = spark.createDataFrame([(v,) for v in a + b], "value long")
    row = kmv_distinct(df, k=k).collect()[0]
    assert row["kth_min"] == merged[-1] and row["n_hashes"] == len(merged)


def test_kmv_k_validation(spark):
    df = spark.createDataFrame([(1,)], "value long")
    with pytest.raises(ValueError):
        kmv_distinct(df, k=1)
    with pytest.raises(ValueError):
        kmv_distinct_by_key(df, "value", k=0)
