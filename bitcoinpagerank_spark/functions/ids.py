"""Vertex ids: 64-bit hashes of normalized URLs.

The reference keys the graph on raw Bitcoin address strings all the way
through the shuffle (PageRankNode.java:29); at 10^12 vertices string keys
are a shuffle-width disaster, so our engine hashes each normalized URL to
a 64-bit id with ``F.xxhash64`` (murmur-family, JVM-side, whole-stage
codegen) and keeps an (id ↔ url) dictionary table for report joins —
the north_star's "murmur-hashed vertex ids".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_to_id(col):
    return F.xxhash64(col)


def edges_from_links(links: DataFrame) -> DataFrame:
    """(src_url, dst_url) → (src_id, dst_id) via xxhash64."""
    return links.select(
        url_to_id(F.col("src_url")).alias("src_id"),
        url_to_id(F.col("dst_url")).alias("dst_id"),
    )


def url_dictionary(links: DataFrame) -> DataFrame:
    """Distinct (id, url) over both link endpoints — join back for reports
    (the analog of the reference's human-readable address keys in
    FindMaxPageRankNodes output)."""
    urls = (
        links.select(F.col("src_url").alias("url"))
        .unionByName(links.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    return urls.select(url_to_id(F.col("url")).alias("id"), "url")
