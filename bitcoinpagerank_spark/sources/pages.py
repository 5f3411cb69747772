"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Generated distributed (spark.range → mapInPandas) so the same generator
serves unit fixtures (N=100) and the sf0.1-scale bench graph (N=10^5+)
without driver materialization. Everything is a pure function of row id —
no RNG state, so any partitioning produces identical rows.

Link structure (FIXTURES.md §1): page i has out-degree i % 5 with
dst indices {(i*7+1) % N, (i*13+3) % N, (i*19+7) % N, (i*23+11) % N}
(first d of these) → ~20% dangling pages; page 0 is a heavy hub linking to
the first min(N/2, 500) pages (exercises salting / skew handling).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)
_LANGS = {0: "de", 1: "fr"}  # row_id % 20 ∈ {0: de, 1: fr, else: en}
_MULTIPLIERS = ((7, 1), (13, 3), (19, 7), (23, 11))
_WORDS = (
    "graph rank link page crawl web spark shuffle partition vertex "
    "edge mass damp iterate converge hash salt block csr lineage"
).split()


def page_url(i: int) -> str:
    return f"https://site{i % 50:04d}.example/p/{i:05d}"


def out_link_indices(i: int, n: int) -> list[int]:
    d = i % 5
    dsts = [(i * a + b) % n for a, b in _MULTIPLIERS[:d]]
    if i == 0:
        dsts = list(range(1, min(n // 2, 500) + 1))
    return [j for j in dict.fromkeys(dsts) if j != i]


def page_body_text(i: int) -> str:
    ws = [_WORDS[(i * k + 3) % len(_WORDS)] for k in range(1, 8)]
    return f"page {i} " + " ".join(ws)


def page_html(i: int, n: int) -> bytes:
    anchors = "".join(
        f'<a href="{page_url(j)}">x</a>' for j in out_link_indices(i, n)
    )
    return (
        f"<html><head><title>T{i}</title></head>"
        f"<body><p>{page_body_text(i)}</p>{anchors}</body></html>"
    ).encode("utf-8")


def generate_pages(
    spark: SparkSession, n: int, num_partitions: int | None = None
) -> DataFrame:
    base = spark.range(0, n, numPartitions=num_partitions or 8)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "url": [page_url(i) for i in ids],
                    "warc_ts": [_EPOCH + timedelta(seconds=17 * i) for i in ids],
                    "html": [page_html(i, n) for i in ids],
                    "text": ["" for _ in ids],
                    "lang": [_LANGS.get(i % 20, "en") for i in ids],
                }
            )

    return base.mapInPandas(build, schema=PAGES_SCHEMA)


def expected_edge_pairs(n: int) -> list[tuple[int, int]]:
    """Index-space oracle for the link structure (src_idx, dst_idx)."""
    out = set()
    for i in range(n):
        for j in out_link_indices(i, n):
            out.add((i, j))
    return sorted(out)
