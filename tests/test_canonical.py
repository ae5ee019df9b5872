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


def test_spark_matches_oracle_combinatorial(spark):
    """Exhaustive component grid (scheme × authority-with-port × path ×
    query × fragment × form params): the Spark identity expressions must
    agree with the Python oracle on every combination — this is what
    makes engine-vs-oracle exact-match tests trustworthy."""
    import itertools

    hosts = ["h.test", "H.Test:8081", "localhost:8082", "a.b.test"]
    paths = ["", "/", "/x", "/x/", "/x/y.html", "/x%20y", "/dir/7"]
    queries = ["", "?k=1", "?k=1&b=2", "?"]
    frags = ["", "#f", "#a/b"]
    forms = [None, "q=1;p=2"]
    urls = [
        (f"http://{h}{p}{q}{fr}", fp)
        for h, p, q, fr, fp in itertools.product(
            hosts, paths, queries, frags, forms
        )
    ]
    df = spark.createDataFrame(urls, "url string, fp string")
    got = df.select(
        "url", "fp",
        url_host(F.col("url")).alias("host"),
        canonical_relative_url(F.col("url"), F.col("fp")).alias("rel"),
        url_seen_key(F.col("url"), F.col("fp")).alias("h64"),
        F.xxhash64(
            F.concat_ws(
                "|",
                url_host(F.col("url")),
                canonical_relative_url(F.col("url"), F.col("fp")),
            )
        ).alias("h64b"),
    ).collect()
    import urllib.parse as up

    mismatches = []
    for r in got:
        want_host = up.urlsplit(r["url"]).netloc.lower()
        want_rel = relative_url(r["url"], r["fp"])
        want_key = seen_key(r["url"], r["fp"])
        got_key = f"{r['host']}|{r['rel']}"
        if (r["host"], r["rel"]) != (want_host, want_rel) or got_key != want_key:
            mismatches.append((r["url"], r["fp"], r["host"], want_host,
                               r["rel"], want_rel))
        assert r["h64"] == r["h64b"]  # key hash is hash(host|rel)
    assert not mismatches, mismatches[:5]


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


def test_blocklist_filter_subdomain_semantics_both_paths(spark):
    """Blocked d blocks d and *.d, never d's parent; the literal and
    exploded-join paths agree; the literal path plans shuffle-free."""
    from smart_crawler_spark.frontier.canonical import blocklist_filter

    urls = [
        ("http://ads.example.test/x", True),       # exact
        ("http://a.b.ads.example.test/x", True),   # deep subdomain
        ("http://example.test/x", False),          # parent of blocked
        ("http://ok.site.test/x", False),
        ("http://badsite.test/x", False),          # no partial-label hit
        ("http://bad.test/", True),
        ("http://sub.bad.test/", True),
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    blocked = ["ads.example.test", "bad.test"]

    lit_out = {
        r["url"]: r["blocked"]
        for r in blocklist_filter(df, blocked).collect()
    }
    assert lit_out == dict(urls)

    # force the exploded-join path with literal_max=0
    join_out = {
        r["url"]: r["blocked"]
        for r in blocklist_filter(df, blocked, literal_max=0).collect()
    }
    assert join_out == dict(urls)

    # drop mode keeps exactly the unblocked rows (both paths)
    for lm in (1000, 0):
        kept = {
            r["url"]
            for r in blocklist_filter(
                df, blocked, keep_blocked_flag=False, literal_max=lm
            ).collect()
        }
        assert kept == {u for u, b in urls if not b}

    plan = (
        blocklist_filter(df, blocked)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_surt_key_edges(spark):
    from smart_crawler_spark.frontier.canonical import surt_key

    cases = [
        ("http://EXAMPLE.Test/", "test,example)/"),
        ("http://a.b.example.test:8080/p/1?x=2#frag",
         "test,example,b,a:8080)/p/1?x=2"),
        ("http://h.test?k=1", "test,h)?k=1"),
        ("http://h.test/deep/path", "test,h)/deep/path"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["s"]
        for r in df.select("url", surt_key("url").alias("s")).collect()
    }
    for u, want in cases:
        assert got[u] == want, (u, got[u])
