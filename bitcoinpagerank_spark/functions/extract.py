"""HTML → (text, links) extraction as a vectorized Arrow UDF.

The reference has no HTML extractor (its edge table comes from the
tx/txin/txout join chain, PrepareDataset.java:24-35); the north_star binds
our engine to Common-Crawl-style pages, so the extractor is the analog of
that whole ETL front-end. The input_hint's "byte-identical extracted text
per url" invariant binds to THIS pinned, dependency-free implementation
(SURVEY.md §2.8, risk R5) — no bs4/lxml version drift.

Pinned extraction spec (deterministic, documented, fixture-locked):
  1. decode html bytes as UTF-8 with errors="replace"
  2. drop <script>/<style> elements including content (case-insensitive)
  3. links := href attribute values of <a> tags, in document order,
     single- or double-quoted, fragments kept (normalization strips them)
  4. text  := remaining markup stripped (tags → single space), HTML
     entities unescaped, whitespace collapsed to single spaces, trimmed

URL normalization (applied to both page urls and extracted hrefs before
vertex hashing):
  - resolve relative hrefs against the page url (RFC 3986 join)
  - lowercase scheme and host; drop fragment; drop default ports
  - keep query; keep trailing slash as-is (no heuristic rewriting)
  - non-http(s) schemes (mailto:, javascript:, data:) → dropped
"""

from __future__ import annotations

import html as _html
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)')""",
                      re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def extract_text(html_bytes: bytes) -> str:
    """Pinned text extraction — the byte-identical-per-url invariant binds here."""
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _SCRIPT_RE.sub(" ", raw)
    txt = _TAG_RE.sub(" ", raw)
    txt = _html.unescape(txt)
    return _WS_RE.sub(" ", txt).strip()


def extract_links(html_bytes: bytes) -> list[str]:
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _SCRIPT_RE.sub(" ", raw)
    return [a or b for a, b in _HREF_RE.findall(raw)]


def normalize_url(base: str, href: str) -> str | None:
    """Resolve + canonicalize; None for non-http(s) or unparseable links."""
    try:
        joined = urljoin(base, href.strip())
        parts = urlsplit(joined)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    default = _DEFAULT_PORTS[scheme]
    if netloc.endswith(default):
        netloc = netloc[: -len(default)]
    return urlunsplit((scheme, netloc, parts.path, parts.query, ""))


_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(_EXTRACT_SCHEMA)
def extract_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    """Arrow-batched scalar UDF: (url, html binary) → struct(text, links).

    Links are already normalized against the page url and filtered to
    http(s); the batch loop is Python over Arrow batches (the regex work
    itself is C), which is the pandas-UDF contract the input_hint mandates —
    there is no row-at-a-time serialization.
    """
    texts: list[str] = []
    links: list[list[str]] = []
    for u, h in zip(url, html):
        b = h if h is not None else b""
        texts.append(extract_text(b))
        raw_links = extract_links(b)
        norm = []
        for href in raw_links:
            n = normalize_url(u, href)
            if n is not None:
                norm.append(n)
        links.append(norm)
    return pd.DataFrame({"text": texts, "links": links})


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → adds extracted text + links."""
    ex = extract_udf(F.col("url"), F.col("html"))
    return pages.withColumn("_ex", ex).select(
        "url",
        "warc_ts",
        "html",
        F.col("_ex.text").alias("text"),
        "lang",
        F.col("_ex.links").alias("links"),
    )


def page_links(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) link pairs — the ETL output feeding vertex hashing."""
    extracted = extract_pages(pages)
    return extracted.select(
        F.col("url").alias("src_url"), F.explode("links").alias("dst_url")
    )
