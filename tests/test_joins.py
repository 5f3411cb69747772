"""Join-chain parity: the Spark plan vs the documented reference SQL
(PrepareDataset.java:24-35) executed by DuckDB on identical inputs."""

from __future__ import annotations

import duckdb
import pytest

from bitcoinpagerank_spark.plans.joins import (
    address_graph,
    bitcoin_edge_etl,
    remaining_nodes,
)
from bitcoinpagerank_spark.sources.bitcoin import generate_bitcoin_tables

REF_EDGE_SQL = """
SELECT txout1.address AS in_address, txout2.address AS out_address
FROM txin
JOIN tx ON txin.prev_out = tx.hash
JOIN txout txout1
  ON tx.id = txout1.tx_id AND txin.prev_out_index = txout1.tx_idx
JOIN txout txout2 ON txin.tx_id = txout2.tx_id
WHERE txout1.address <> 'unknown' AND txout2.address <> 'unknown'
"""


@pytest.fixture(scope="module")
def tables(spark):
    tx, txin, txout = generate_bitcoin_tables(spark, n_tx=100)
    con = duckdb.connect()
    con.register("tx", tx.toPandas())
    con.register("txin", txin.toPandas())
    con.register("txout", txout.toPandas())
    return tx, txin, txout, con


def test_edges_match_duckdb(spark, tables):
    tx, txin, txout, con = tables
    res = bitcoin_edge_etl(tx, txin, txout)
    got = sorted(
        (r["in_address"], r["out_address"]) for r in res.edges.collect()
    )
    want = sorted(map(tuple, con.execute(REF_EDGE_SQL).fetchall()))
    assert got == want
    assert len(got) > 100  # non-trivial


def test_distinct_out_matches(spark, tables):
    tx, txin, txout, con = tables
    res = bitcoin_edge_etl(tx, txin, txout)
    got = sorted(r["out_address"] for r in res.distinct_out.collect())
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT out_address FROM ({REF_EDGE_SQL})"
        ).fetchall()
    )
    assert got == want


def test_remaining_nodes_left_anti(spark, tables):
    tx, txin, txout, con = tables
    res = bitcoin_edge_etl(tx, txin, txout)
    got = sorted(r["address"] for r in res.remaining.collect())
    want = sorted(
        r[0]
        for r in con.execute(
            f"""WITH e AS ({REF_EDGE_SQL})
            SELECT DISTINCT out_address FROM e
            WHERE out_address NOT IN (SELECT in_address FROM e)"""
        ).fetchall()
    )
    assert got == want


def test_unknown_kept_when_disabled(spark, tables):
    tx, txin, txout, con = tables
    res = bitcoin_edge_etl(tx, txin, txout, drop_unknown=False)
    n_all = res.edges.count()
    n_filtered = bitcoin_edge_etl(tx, txin, txout).edges.count()
    assert n_all > n_filtered  # fixture guarantees some 'unknown'


def test_address_graph_dedup_roundtrip(spark, tables):
    tx, txin, txout, _ = tables
    res = bitcoin_edge_etl(tx, txin, txout)
    g = address_graph(res.edges)
    assert g.count() == res.edges.distinct().count()
    multi = address_graph(res.edges, dedup=False)
    assert multi.count() == res.edges.count()


# ------------------------------------------------------------- as-of join

def test_as_of_join_semantics(spark):
    from bitcoinpagerank_spark.plans.joins import as_of_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 20, 150), (4, 30, 100)],
        "eid long, k long, t long",
    )
    right = spark.createDataFrame(
        [(10, 100, "a"), (10, 200, "b"), (20, 160, "c")],
        "k long, t long, v string",
    )
    out = as_of_join(left, right, ["k"], ["k"], "t", "t").orderBy("eid")
    rows = [(r["eid"], r["v"]) for r in out.collect()]
    # eid1: equality t=100 matches "a"; eid2: latest <=205 is "b";
    # eid3: right row at 160 is AFTER 150 -> null; eid4: key 30 absent -> null
    assert rows == [(1, "a"), (2, "b"), (3, None), (4, None)]
    inner = as_of_join(left, right, ["k"], ["k"], "t", "t", how="inner")
    assert sorted(r["eid"] for r in inner.collect()) == [1, 2]
    # left columns survive untouched
    assert out.columns == ["eid", "k", "t", "v"]


def test_snapshot_delta(spark):
    from bitcoinpagerank_spark.plans.joins import snapshot_delta

    old = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    new = spark.createDataFrame([(2,), (3,), (4,), (4,)], "k long")  # dup in new
    rows = {(r["k"], r["change"])
            for r in snapshot_delta(old, new, ["k"]).collect()}
    assert rows == {(1, "removed"), (4, "added")}
