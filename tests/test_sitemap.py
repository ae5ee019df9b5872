"""Hand-written sitemap fixtures: optional fields, CDATA, entities,
namespace prefixes, index files, malformed entries."""

from __future__ import annotations

from smart_crawler_spark.sources.sitemap import parse_sitemaps

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://a.test/p?x=1&amp;y=2</loc>
    <lastmod>2024-03-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url>
    <loc><![CDATA[http://a.test/raw?x=1&y=2]]></loc>
  </url>
  <url>
    <lastmod>2024-03-02</lastmod>
  </url>
  <url>
    <loc>
      http://a.test/ws
    </loc>
    <priority>0.1</priority>
  </url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sm:sitemap>
    <sm:loc>http://a.test/sitemap1.xml</sm:loc>
    <sm:lastmod>2024-01-05</sm:lastmod>
  </sm:sitemap>
  <sm:sitemap><sm:loc>http://a.test/sitemap2.xml</sm:loc></sm:sitemap>
</sm:sitemapindex>"""


def test_urlset_fields_cdata_entities_whitespace(spark):
    df = spark.createDataFrame([("s1", URLSET)], "site string, xml string")
    rows = sorted(
        parse_sitemaps(df, passthrough=["site"]).collect(),
        key=lambda r: r["loc"],
    )
    # entry without <loc> is dropped
    assert [r["loc"] for r in rows] == [
        "http://a.test/p?x=1&y=2",  # &amp; decoded
        "http://a.test/raw?x=1&y=2",  # CDATA taken raw
        "http://a.test/ws",  # surrounding whitespace trimmed
    ]
    full = rows[0]
    assert (full["kind"], full["site"]) == ("url", "s1")
    assert full["lastmod"] == "2024-03-01"
    assert full["changefreq"] == "daily"
    assert full["priority"] == 0.8
    assert rows[1]["lastmod"] is None and rows[1]["priority"] is None
    assert rows[2]["priority"] == 0.1


def test_sitemapindex_with_namespace_prefix(spark):
    df = spark.createDataFrame([("s2", INDEX)], "site string, xml string")
    rows = sorted(
        parse_sitemaps(df, passthrough=["site"]).collect(),
        key=lambda r: r["loc"],
    )
    assert [(r["kind"], r["loc"], r["lastmod"]) for r in rows] == [
        ("sitemap", "http://a.test/sitemap1.xml", "2024-01-05"),
        ("sitemap", "http://a.test/sitemap2.xml", None),
    ]


def test_amp_lt_double_escape_roundtrip(spark):
    xml = "<urlset><url><loc>http://a.test/?q=&amp;lt;tag&amp;gt;</loc></url></urlset>"
    df = spark.createDataFrame([(xml,)], "xml string")
    (row,) = parse_sitemaps(df).collect()
    # &amp;lt; must decode to the literal text '&lt;', not to '<'
    assert row["loc"] == "http://a.test/?q=&lt;tag&gt;"


def test_urlset_not_confused_with_url_tag(spark):
    # <urlset> / <sitemapindex> wrappers must not match as entries
    xml = "<urlset><url><loc>http://x.test/</loc></url></urlset>"
    df = spark.createDataFrame([(xml,)], "xml string")
    rows = parse_sitemaps(df).collect()
    assert len(rows) == 1 and rows[0]["kind"] == "url"
