"""URL canonicalization: Spark expression ≡ Python oracle, and the
reference's dedup equivalences (CrawlQueueTest.java:89-116)."""

from pyspark.sql import functions as F

from smart_crawler_spark.crawler.oracle import relative_url, seen_key
from smart_crawler_spark.frontier.canonical import (
    canonical_relative_url,
    url_host,
    url_seen_key,
)

URLS = [
    "http://h.test",
    "http://h.test/",
    "http://h.test/#frag",
    "http://h.test/a",
    "http://h.test/a/",
    "http://h.test/a#frag",
    "http://h.test/a?k=1",
    "http://h.test/a?k=1#frag",
    "http://h.test/?k=1",
    "http://H.TEST/a",
    "http://h.test/detail/7",
]


def test_spark_matches_oracle(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = df.select(
        "url",
        canonical_relative_url(F.col("url")).alias("rel"),
        url_host("url").alias("host"),
    ).collect()
    for row in got:
        assert row["rel"] == relative_url(row["url"]), row["url"]
        assert row["host"] == row["url"].split("/")[2].lower()


def test_reference_equivalences():
    # trailing slash and fragment are identity-preserving
    assert relative_url("http://h.test") == relative_url("http://h.test/")
    assert relative_url("http://h.test/a") == relative_url("http://h.test/a#f")
    # query strings distinguish pages (when path is non-root)
    assert relative_url("http://h.test/a?k=1") != relative_url("http://h.test/a")
    # the reference's early-return quirk: root path drops the query
    assert relative_url("http://h.test/?k=1") == relative_url("http://h.test/")
    # form params distinguish
    assert relative_url("http://h.test/a", "k=v") != relative_url("http://h.test/a")
    assert seen_key("http://A.test/x") == seen_key("http://a.test/x")


def test_hash_key_consistency(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    hashes = df.select(
        "url", url_seen_key(F.col("url")).alias("h")
    ).collect()
    keys = df.select(
        "url",
        F.concat_ws(
            "|", url_host("url"), canonical_relative_url(F.col("url"))
        ).alias("k"),
    ).collect()
    rehash = spark.createDataFrame([(r["k"],) for r in keys], "k string").select(
        F.xxhash64("k").alias("h")
    ).collect()
    assert [r["h"] for r in hashes] == [r["h"] for r in rehash]
    # python-side key string matches spark-side key string
    for r in keys:
        assert r["k"] == seen_key(r["url"])
