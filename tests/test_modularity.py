"""Host-partition modularity: catalog query vs a python oracle on the
same deterministic doc graph (sf0.001)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from bitcoinpagerank_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _doc_graph_py(spark):
    e = catalog.doc_edges(spark, SF).collect()
    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    und = {(min(r[0], r[1]), max(r[0], r[1])) for r in e}
    return und, docs


def test_host_modularity_matches_python_oracle(spark):
    und, host = _doc_graph_py(spark)
    m = len(und)
    e_in = defaultdict(int)
    deg = defaultdict(int)
    for u, v in und:
        deg[u] += 1
        deg[v] += 1
        if host[u] == host[v]:
            e_in[host[u]] += 1
    d_c = defaultdict(int)
    for v, d in deg.items():
        d_c[host[v]] += d
    want = sum(e_in[h] / m - (d_c[h] / (2 * m)) ** 2 for h in d_c)
    got = catalog.queries()["g_host_modularity"](spark, SF).collect()[0][0]
    assert got == pytest.approx(round(want, 6), abs=2e-6)
