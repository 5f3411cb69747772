"""R-MAT generator: determinism, bounds, and power-law skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitcoinpagerank_spark.sources.rmat import rmat_edges


def test_rmat_deterministic_and_bounded(spark):
    a = rmat_edges(spark, scale=8, n_edges=2000)
    b = rmat_edges(spark, scale=8, n_edges=2000)
    ra = sorted(tuple(r) for r in a.collect())
    assert ra == sorted(tuple(r) for r in b.collect())
    stats = a.agg(
        F.min("src_id"), F.max("src_id"), F.min("dst_id"), F.max("dst_id")
    ).collect()[0]
    assert stats[0] >= 0 and stats[1] < 256
    assert stats[2] >= 0 and stats[3] < 256
    # a different seed gives a different graph
    c = rmat_edges(spark, scale=8, n_edges=2000, seed=11)
    assert sorted(tuple(r) for r in c.collect()) != ra


def test_rmat_degree_skew(spark):
    e = rmat_edges(spark, scale=10, n_edges=16_000)
    deg = e.groupBy("src_id").count()
    row = deg.agg(F.max("count").alias("mx"), F.avg("count").alias("mean")).collect()[0]
    # power-law: the hottest vertex is far above the mean out-degree
    assert row["mx"] > 8 * row["mean"]
    # and the default quadrant probs bias mass toward low ids
    low = e.where("src_id < 256").count()
    assert low > e.count() * 0.4


def test_rmat_guards(spark):
    with pytest.raises(ValueError):
        rmat_edges(spark, scale=0)
