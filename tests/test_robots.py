"""robots.txt enforcement (north_rule: politeness + robots).

Parser semantics (RFC 9309 longest-match, wildcards, group selection),
vectorized-filter == pure-Python-decide equivalence, and engine
integration: disallowed URLs are never fetched, never enter the frontier
or the seen set; Crawl-delay tightens the per-host round budget."""

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
from smart_crawler_spark.datagen.site import (
    SiteConfig,
    generate_site_pages,
    target_tsv,
)
from smart_crawler_spark.frontier.canonical import url_seen_key
from smart_crawler_spark.frontier.robots import (
    RobotsPolicy,
    decide,
    filter_allowed,
    parse_robots,
)
from smart_crawler_spark.sources.targets import load_target_tsv

# ---------------------------------------------------------------- parser


def test_parse_groups_and_agent_selection():
    txt = """
    User-agent: googlebot
    Disallow: /g/

    User-agent: *
    Disallow: /all/
    Crawl-delay: 2
    """
    star = parse_robots(txt, agent="mybot")
    assert [r.pattern for r in star.rules] == ["/all/"]
    assert star.crawl_delay_s == 2.0
    goog = parse_robots(txt, agent="Googlebot/2.1")
    assert [r.pattern for r in goog.rules] == ["/g/"]
    assert goog.crawl_delay_s is None


def test_parse_multi_ua_group_and_empty_disallow():
    txt = """
    User-agent: a
    User-agent: b
    Disallow: /x
    Allow: /x/ok

    User-agent: c
    Disallow:
    """
    got = parse_robots(txt, agent="b")
    assert [(r.allow, r.pattern) for r in got.rules] == [
        (False, "/x"),
        (True, "/x/ok"),
    ]
    assert parse_robots(txt, agent="c").rules == []  # empty Disallow = none


def test_parse_merges_equal_specificity_groups():
    # RFC 9309 §2.2.1: two groups matching at the same specificity
    # combine — the second '*' group's rules must not be dropped
    txt = """
    User-agent: *
    Disallow: /a/
    Crawl-delay: 1

    User-agent: specialbot
    Disallow: /s/

    User-agent: *
    Disallow: /b/
    Crawl-delay: 3
    """
    star = parse_robots(txt, agent="mybot")
    assert [r.pattern for r in star.rules] == ["/a/", "/b/"]
    assert star.crawl_delay_s == 3.0  # max across merged groups
    # the specific group beats '*' and does NOT merge with it
    spec = parse_robots(txt, agent="specialbot/1.0")
    assert [r.pattern for r in spec.rules] == ["/s/"]


def test_parse_ua_prefix_not_substring():
    # group token matches as a prefix of the agent product token, not
    # substring-anywhere ('bot' must not capture 'somebot')
    txt = """
    User-agent: bot
    Disallow: /bot/

    User-agent: *
    Disallow: /all/
    """
    assert [r.pattern for r in parse_robots(txt, agent="somebot").rules] == [
        "/all/"
    ]
    assert [r.pattern for r in parse_robots(txt, agent="bot/2.0").rules] == [
        "/bot/"
    ]


@pytest.mark.parametrize(
    "rules_txt,path,expected",
    [
        # longest match wins
        ("Disallow: /detail/\nAllow: /detail/1", "/detail/1", True),
        ("Disallow: /detail/\nAllow: /detail/1", "/detail/2", False),
        # $ anchors
        ("Disallow: /dir1$", "/dir1", False),
        ("Disallow: /dir1$", "/dir1/page1", True),
        # * wildcard
        ("Disallow: /*/page", "/dir0/page1", False),
        ("Disallow: /*/page", "/dir0", True),
        # equal length: allow wins
        ("Disallow: /a/b\nAllow: /a/c", "/a/b", False),
        ("Allow: /ab\nDisallow: /ab", "/ab", True),
        # no matching rule: default allow
        ("Disallow: /private/", "/", True),
        # query string is part of the match target
        ("Disallow: /search?", "/search?q=1", False),
    ],
)
def test_decide_semantics(rules_txt, path, expected):
    hr = parse_robots("User-agent: *\n" + rules_txt)
    assert decide(hr.rules, path) is expected


# ------------------------------------------------ vectorized == decide()


def test_filter_allowed_matches_decide(spark):
    texts = {
        "h0.test": "User-agent: *\nDisallow: /detail/\nAllow: /detail/1$",
        "h1.test": "User-agent: *\nDisallow: /dir*/page\nDisallow: /about$",
    }
    policy = RobotsPolicy(texts)
    urls = [
        f"http://{h}{p}"
        for h in ["h0.test", "h1.test", "h2.test"]
        for p in [
            "/", "/about", "/dir0", "/dir0/page1", "/detail/1",
            "/detail/10", "/detail/2", "/dir1/page3#frag",
        ]
    ]
    df = spark.createDataFrame(
        [(u,) for u in urls], "url string"
    ).withColumn("host", F.regexp_extract("url", r"^http://([^/]*)", 1))
    got = sorted(r["url"] for r in filter_allowed(df, policy).collect())
    import re as _re

    def path_of(u):
        p = _re.sub(r"^http://[^/]*", "", u)
        p = _re.sub(r"#.*$", "", p)
        return p or "/"

    want = sorted(
        u
        for u in urls
        if decide(
            policy.by_host.get(
                _re.match(r"^http://([^/]*)", u).group(1),
                type("x", (), {"rules": []}),
            ).rules,
            path_of(u),
        )
    )
    assert got == want
    assert "http://h0.test/detail/1" in got       # Allow exception ($)
    assert "http://h0.test/detail/10" not in got  # $ stops prefix bleed
    assert "http://h1.test/about" not in got


def test_filter_allowed_pathless_query(spark):
    """A path-less URL with a query matches rules against /?q=... — the
    authority must stop at '?', not swallow the query (and the same for
    the column-level twin url_path_query)."""
    from smart_crawler_spark.frontier.robots import url_path_query

    policy = RobotsPolicy({"h.test": "User-agent: *\nDisallow: /?q="})
    df = spark.createDataFrame(
        [("http://h.test?q=1",), ("http://h.test",), ("http://h.test/ok?q=1",)],
        "url string",
    ).withColumn("host", F.lit("h.test"))
    got = {r["url"] for r in filter_allowed(df, policy).collect()}
    assert got == {"http://h.test", "http://h.test/ok?q=1"}
    paths = {
        r["url"]: r["p"]
        for r in df.select("url", url_path_query(F.col("url")).alias("p")).collect()
    }
    assert paths == {
        "http://h.test?q=1": "/?q=1",
        "http://h.test": "/",
        "http://h.test/ok?q=1": "/ok?q=1",
    }


# ------------------------------------------------------ engine semantics

CFG = SiteConfig(n_hosts=2, dirs=2, chain=2, details_per_page=2, n_images=20)


def _run(spark, tmp_path, robots, cfg=None):
    model = load_target_tsv(target_tsv(CFG))
    pages = generate_site_pages(spark, CFG).localCheckpoint()
    seeds = [f"http://{CFG.host(k)}/" for k in range(CFG.n_hosts)]
    eng = CrawlEngine(
        spark, pages, model, str(tmp_path),
        cfg or EngineConfig(budget_per_host=100),
        robots=robots,
    )
    return eng.run(seeds)


def test_engine_robots_filter(spark, tmp_path):
    h0 = CFG.host(0)
    policy = RobotsPolicy(
        {h0: "User-agent: *\nDisallow: /detail/\nAllow: /detail/1$"}
    )
    res = _run(spark, tmp_path, policy)
    fetched = {
        (r["host"], r["url"]) for r in res.order.filter("fetched").collect()
    }
    h0_details = {u for h, u in fetched if h == h0 and "/detail/" in u}
    assert h0_details == {f"http://{h0}/detail/1"}
    # host 1 (no robots) crawls all its details
    h1 = CFG.host(1)
    h1_details = {u for h, u in fetched if h == h1 and "/detail/" in u}
    assert len(h1_details) == CFG.dir_pages() * CFG.details_l(1)
    # disallowed URLs never entered the seen set
    seen = {r["url_hash"] for r in res.seen.collect()}
    blocked = spark.createDataFrame(
        [(f"http://{h0}/detail/0",)], "url string"
    ).select(url_seen_key(F.col("url")).alias("k"))
    assert blocked.collect()[0]["k"] not in seen


def test_engine_crawl_delay_budget(spark, tmp_path):
    h0 = CFG.host(0)
    # delay 5s, round 10s -> 2 fetches/round on h0; h1 unconstrained
    policy = RobotsPolicy({h0: "User-agent: *\nCrawl-delay: 5"})
    res = _run(
        spark, tmp_path, policy,
        EngineConfig(budget_per_host=100, round_ms=10_000),
    )
    per_round = {
        (r["round"], r["host"]): r["n"]
        for r in res.order.groupBy("round", "host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(n <= 2 for (rnd, h), n in per_round.items() if h == h0)
    h1 = CFG.host(1)
    assert max(n for (rnd, h), n in per_round.items() if h == h1) > 2
    # both hosts still crawl completely (delay defers, never drops)
    n_h0 = res.order.filter(F.col("host") == h0).count()
    assert n_h0 == CFG.pages_per_host(0)


def test_sitemap_directive_is_group_independent():
    """Sitemap: lines apply to every agent wherever they appear — before
    any group, inside a non-matching group, case preserved."""
    text = (
        "Sitemap: http://h/Sitemap-Main.xml\n"
        "User-agent: otherbot\n"
        "Disallow: /\n"
        "Sitemap: http://h/s2.xml\n"
        "User-agent: mybot\n"
        "Allow: /\n"
    )
    hr = parse_robots(text, agent="mybot")
    assert hr.sitemaps == ["http://h/Sitemap-Main.xml", "http://h/s2.xml"]
    # an agent with NO matching group still sees the sitemaps
    hr_none = parse_robots("Sitemap: http://h/s.xml\n", agent="x")
    assert hr_none.sitemaps == ["http://h/s.xml"] and hr_none.rules == []


def test_sitemap_seeds_df(spark):
    policy = RobotsPolicy(
        {
            "a.test": "Sitemap: http://a.test/s.xml\nUser-agent: *\nDisallow: /x\n",
            "b.test": "User-agent: *\nAllow: /\n",
        }
    )
    rows = {
        (r["host"], r["sitemap_url"])
        for r in policy.sitemap_seeds(spark).collect()
    }
    assert rows == {("a.test", "http://a.test/s.xml")}
    # rules unaffected by the sitemap line
    assert len(policy.by_host["a.test"].rules) == 1
