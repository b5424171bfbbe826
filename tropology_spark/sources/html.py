"""HTTP/HTML source (SURVEY.md §2 A5) — the crawl ingest path.

The reference fetches live TVTropes pages with Enlive and extracts
pmwiki links (``parsing.clj`` — reconstructed, SURVEY.md §3.1).  The
Spark shape: the crawl frontier is a DataFrame of URLs; fetch+parse is
an Arrow-batched stage producing (page metadata, outbound codes);
``explode`` turns one page into its link batch.

Network fetch is STUBBED (no network in this environment, and live
crawling is untestable by design — the reference's own tests also run
on saved local HTML, SURVEY.md §5.1).  The parser is real and runs
against inline HTML fixtures in
tests/test_units.py::test_html_parse_links_and_redirect.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

#: Output of the parse stage: one row per page.
PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("code", StringType(), True),
        StructField("category", StringType(), True),
        StructField("title", StringType(), True),
        StructField("is_redirect", StringType(), False),  # 'true'/'false'
        StructField("links", ArrayType(StringType()), False),
    ]
)

#: pmwiki URL pattern (the reference's link-extraction gate).
_PMWIKI_RE = re.compile(
    r"href=[\"']([^\"']*pmwiki\.php/([A-Za-z0-9]+)/([A-Za-z0-9]+))[\"']"
)
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
_OG_URL_RE = re.compile(
    r"property=[\"']og:url[\"']\s+content=[\"']([^\"']+)[\"']"
)


def code_from_url(url: str) -> str | None:
    """``Category/PageName`` → lowercased identity (``base.clj
    code-from-url`` shape)."""
    m = re.search(r"pmwiki\.php/([A-Za-z0-9]+)/([A-Za-z0-9]+)", url)
    if not m:
        return None
    return f"{m.group(1)}/{m.group(2)}".lower()


def parse_page(url: str, html: str) -> dict:
    """Pure parser: metadata + outbound pmwiki links from one page."""
    og = _OG_URL_RE.search(html)
    canonical = og.group(1) if og else url
    code = code_from_url(canonical)
    title_m = _TITLE_RE.search(html)
    links = sorted(
        {
            f"{m[1]}/{m[2]}".lower()
            for m in _PMWIKI_RE.findall(html)
        }
        - ({code} if code else set())
    )
    return {
        "url": url,
        "code": code,
        "category": code.split("/")[0] if code else None,
        "title": title_m.group(1).strip() if title_m else None,
        # redirect: canonical og:url disagrees with the fetched URL
        "is_redirect": "true" if (code and code_from_url(url) not in (None, code)) else "false",
        "links": links,
    }


def fetch_html(url: str) -> str:
    """Real HTTP fetch hook — intentionally unimplemented (no network
    in this environment).  Tests inject HTML via ``parse_pages`` on a
    (url, html) DataFrame."""
    raise NotImplementedError("network fetch not available; supply html column")


def parse_pages(frontier: DataFrame) -> DataFrame:
    """The crawl parse stage: (url, html) rows → PAGE_SCHEMA rows via
    Arrow-batched mapInPandas (SURVEY.md §3.1 Spark design)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [parse_page(u, h) for u, h in zip(pdf["url"], pdf["html"])],
                columns=[f.name for f in PAGE_SCHEMA.fields],
            )

    return frontier.mapInPandas(run, schema=PAGE_SCHEMA)
