"""Sitemap XML ingestion (sitemaps.org protocol).

The reference discovers URLs only by following links from the seed
(``crawler/CrawlFrontier.java``); real crawls also bootstrap the
frontier from ``sitemap.xml`` / sitemap-index files advertised in
robots.txt. This source parses raw sitemap XML documents into URL
entries — ``<urlset><url>`` rows and ``<sitemapindex><sitemap>`` rows
(nested index files to fetch next) — as a pure Catalyst expression
chain: fragment explode + regexp extraction, no XML library and no
Python UDF, so parsing runs inside whole-stage codegen and scales as a
map-only pass over however many sitemap documents the fetch tier
downloaded.

Spec behaviors implemented (sitemaps.org 0.9):
- optional per-entry fields (``lastmod``/``changefreq``/``priority``)
  may be present on any subset of entries — extraction is per-fragment,
  so missing fields never misalign (an ``arrays_zip`` over per-document
  ``xpath()`` arrays WOULD misalign them; that's why fragments).
- ``<![CDATA[...]]>`` content is taken raw; non-CDATA text is XML
  entity-decoded (``&amp;`` last, so ``&amp;lt;`` round-trips).
- tags may carry a namespace prefix (``<sm:url>``) or attributes.
- entries without a ``<loc>`` are dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CDATA_RE = r"(?s)^<!\[CDATA\[(.*)\]\]>$"


def _xml_unescape(c: Column) -> Column:
    # &amp; decoded LAST: '&amp;lt;' must yield '&lt;', not '<'
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _field(frag: Column, tag: str) -> Column:
    raw = F.regexp_extract(
        frag,
        rf"(?s)<(?:\w+:)?{tag}[^>]*>\s*(.*?)\s*</(?:\w+:)?{tag}>",
        1,
    )
    cdata = F.regexp_extract(raw, _CDATA_RE, 1)
    val = F.when(
        raw.rlike(_CDATA_RE), cdata
    ).otherwise(_xml_unescape(raw))
    return F.when(val != "", val)


def parse_sitemaps(
    df: DataFrame, xml_col: str = "xml", passthrough: list[str] | None = None
) -> DataFrame:
    """Explode sitemap documents into one row per entry.

    Returns ``passthrough + (kind, loc, lastmod, changefreq, priority)``
    where ``kind`` is ``'url'`` for ``<urlset>`` entries and
    ``'sitemap'`` for ``<sitemapindex>`` entries (their ``loc`` is the
    next sitemap file to fetch — the crawl tier loops those back
    through the fetch stage until no index entries remain).
    """
    passthrough = passthrough or []
    x = F.col(xml_col)

    def frags(tag: str, kind: str) -> Column:
        arr = F.expr(
            f"regexp_extract_all({xml_col}, "
            f"'(?s)<(?:\\\\w+:)?{tag}\\\\b[^>]*>(.*?)</(?:\\\\w+:)?{tag}>', 1)"
        )
        return F.transform(
            arr, lambda e: F.struct(F.lit(kind).alias("kind"), e.alias("frag"))
        )

    entries = F.explode(
        F.concat(frags("url", "url"), frags("sitemap", "sitemap"))
    ).alias("_e")
    out = df.select(*passthrough, entries).select(
        *passthrough,
        F.col("_e.kind").alias("kind"),
        _field(F.col("_e.frag"), "loc").alias("loc"),
        _field(F.col("_e.frag"), "lastmod").alias("lastmod"),
        _field(F.col("_e.frag"), "changefreq").alias("changefreq"),
        _field(F.col("_e.frag"), "priority").cast("double").alias("priority"),
    )
    return out.filter(F.col("loc").isNotNull())
