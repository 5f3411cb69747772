from __future__ import annotations

import pytest

from oracles import pagerank_oracle

from bitcoinpagerank_spark.functions.extract import (
    extract_links,
    extract_text,
    normalize_url,
)
from bitcoinpagerank_spark.functions.ids import url_to_id
from bitcoinpagerank_spark.operators.pagerank import pagerank
from bitcoinpagerank_spark.plans.linkgraph import build_link_graph
from bitcoinpagerank_spark.sources.pages import (
    expected_edge_pairs,
    generate_pages,
    page_html,
    page_url,
)
from pyspark.sql import functions as F


# ------------------------------------------------------- pure-function spec

def test_extract_text_pinned():
    html = (
        b"<html><head><title>T1</title><script>var x=1;</script></head>"
        b"<body><p>hello &amp; world</p><style>p{}</style>"
        b'<a href="https://a.example/x">go</a></body></html>'
    )
    # pinned invariant: byte-identical extraction
    assert extract_text(html) == "T1 hello & world go"


def test_extract_links_order_and_quotes():
    html = b"<a href='https://a.example/1'>a</a><a HREF=\"https://a.example/2\">b</a>"
    assert extract_links(html) == ["https://a.example/1", "https://a.example/2"]


@pytest.mark.parametrize(
    "base,href,want",
    [
        ("https://a.example/p/1", "/q", "https://a.example/q"),
        ("https://a.example/p/1", "HTTPS://B.Example:443/x#frag", "https://b.example/x"),
        ("https://a.example/p/1", "http://c.example:80/y?k=v", "http://c.example/y?k=v"),
        ("https://a.example/p/1", "mailto:x@y.z", None),
        ("https://a.example/p/1", "javascript:void(0)", None),
        ("https://a.example/p/1", "rel/path", "https://a.example/p/rel/path"),
    ],
)
def test_normalize_url(base, href, want):
    assert normalize_url(base, href) == want


def test_extraction_is_deterministic():
    h = page_html(3, 100)
    assert extract_text(h) == extract_text(bytes(h))
    assert extract_text(h).encode() == extract_text(h).encode()


# --------------------------------------------------------- pipeline (spark)

def test_pages_to_edges_matches_index_oracle(spark):
    n = 100
    pages = generate_pages(spark, n, num_partitions=4)
    lg = build_link_graph(pages, num_partitions=4)
    got = {(r["src_id"], r["dst_id"]) for r in lg.edges.collect()}
    id_of = {i: None for i in range(n)}
    url_ids = {
        r["url"]: r["id"] for r in lg.url_dict.collect()
    }
    want = {
        (url_ids[page_url(s)], url_ids[page_url(d)])
        for s, d in expected_edge_pairs(n)
    }
    assert got == want


def test_pages_text_column_filled(spark):
    pages = generate_pages(spark, 20, num_partitions=2)
    from bitcoinpagerank_spark.functions.extract import extract_pages

    ex = extract_pages(pages).select("url", "text", "html").collect()
    for r in ex:
        assert r["text"] == extract_text(bytes(r["html"])), r["url"]
        assert r["text"].startswith("T")


def test_hub_page_degree(spark):
    n = 200
    pages = generate_pages(spark, n, num_partitions=4)
    lg = build_link_graph(pages)
    hub_id_row = lg.url_dict.where(F.col("url") == page_url(0)).first()
    deg = lg.edges.where(F.col("src_id") == hub_id_row["id"]).count()
    assert deg == min(n // 2, 500)


def test_end_to_end_pagerank_on_pages(spark):
    """SURVEY.md §7 minimum slice: pages → extract → ids → edges → PageRank
    → allclose vs numpy oracle on the same index-space graph."""
    n = 120
    pages = generate_pages(spark, n, num_partitions=4)
    lg = build_link_graph(pages, num_partitions=4)
    res = pagerank(spark, lg.edges, tol=1e-9, max_iter=200)
    assert res.converged

    # map hashed ids back to indices for the oracle comparison
    url_ids = {r["url"]: r["id"] for r in lg.url_dict.collect()}
    idx_edges = expected_edge_pairs(n)
    want = pagerank_oracle(
        [(url_ids[page_url(s)], url_ids[page_url(d)]) for s, d in idx_edges]
    )
    got = {r["id"]: r["score"] for r in res.ranks.collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_vertex_id_is_xxhash64(spark):
    df = spark.createDataFrame([("https://a.example/x",)], "u string")
    got = df.select(url_to_id(F.col("u")).alias("id")).first()["id"]
    want = df.select(F.xxhash64(F.col("u")).alias("id")).first()["id"]
    assert got == want
