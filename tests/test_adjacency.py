from __future__ import annotations

import numpy as np

from oracles import components_oracle, pagerank_oracle
import pytest

from bitcoinpagerank_spark.sources.adjacency import (
    adjacency_vertices,
    read_adjacency_text,
)
from bitcoinpagerank_spark.operators.pagerank import pagerank


def _write_adj(tmp_path, lines):
    p = tmp_path / "adj.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_parse_gnutella_format(spark, tmp_path):
    # shape of reference data/p2p-Gnutella08-adj.txt: src\tdst1\tdst2...;
    # bare line = sink vertex
    path = _write_adj(tmp_path, ["0\t1\t2", "1\t2", "2", "3 0 1"])
    edges = read_adjacency_text(spark, path)
    got = {(r["src_id"], r["dst_id"]) for r in edges.collect()}
    assert got == {(0, 1), (0, 2), (1, 2), (3, 0), (3, 1)}
    verts = {r["id"] for r in adjacency_vertices(spark, path).collect()}
    assert verts == {0, 1, 2, 3}


def test_random_adjacency_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(42)
    n = 50
    mask = rng.random((n, n)) < 0.06
    np.fill_diagonal(mask, False)
    lines = []
    edges = []
    for i in range(n):
        dsts = [str(j) for j in mask[i].nonzero()[0]]
        edges += [(i, int(j)) for j in mask[i].nonzero()[0]]
        lines.append("\t".join([str(i)] + dsts))
    path = _write_adj(tmp_path, lines)
    df = read_adjacency_text(spark, path)
    assert {(r["src_id"], r["dst_id"]) for r in df.collect()} == set(edges)

    res = pagerank(spark, df)
    want = pagerank_oracle(edges)
    got = {r["id"]: r["score"] for r in res.ranks.collect()}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    assert components_oracle(edges)  # oracle sane on this graph


def test_adjacency_write_read_round_trip(spark, tmp_path):
    from bitcoinpagerank_spark.sources.adjacency import (
        adjacency_vertices,
        read_adjacency_text,
        write_adjacency_text,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "src_id long, dst_id long"
    )
    path = str(tmp_path / "adj_rt")
    write_adjacency_text(edges, path)
    back = {(r["src_id"], r["dst_id"])
            for r in read_adjacency_text(spark, path).collect()}
    assert back == {(1, 2), (1, 3), (2, 3), (4, 5)}
    # sink-only vertices (3, 5) appear as bare lines
    verts = {r["id"] for r in adjacency_vertices(spark, path).collect()}
    assert verts == {1, 2, 3, 4, 5}
