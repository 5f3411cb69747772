"""The edge-table ETL plan: pages → links → deduplicated (src_id, dst_id).

This is the Spark-first replacement for the reference's whole
PrepareDataset chain (PrepareDataset.java:113-118: five MapReduce jobs,
each fully materialized to HDFS text between stages). Here the chain is
one lazy DataFrame expression — Catalyst pipelines extraction, hashing,
dedup and filtering into a single DAG with only the dedup shuffle
materialized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.extract import page_links
from ..functions.ids import edges_from_links, url_dictionary
from ..operators.edges import dedup_edges


@dataclass
class LinkGraph:
    edges: DataFrame        # (src_id, dst_id) deduplicated, no self-loops
    url_dict: DataFrame     # (id, url)


def build_link_graph(
    pages: DataFrame,
    num_partitions: int | None = None,
    keep_external: bool = True,
) -> LinkGraph:
    """pages(url, warc_ts, html, text, lang) → LinkGraph.

    ``keep_external=False`` restricts edges to dst urls that exist as pages
    (the crawl-closure view); default keeps all extracted links (matching
    the reference, whose edge table contains every address seen,
    PrepareThirdJoin.java:24-27).
    """
    links = page_links(pages)
    if not keep_external:
        known = pages.select(F.col("url").alias("dst_url")).distinct()
        links = links.join(known, "dst_url", "left_semi")
    edges = dedup_edges(edges_from_links(links))
    if num_partitions:
        edges = edges.repartition(num_partitions, "src_id")
    return LinkGraph(edges=edges, url_dict=url_dictionary(links))
