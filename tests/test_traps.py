"""Crawler-trap detection + URL template mining (frontier/traps.py):
rule correctness on planted URL shapes and zero-shuffle / single-agg
plan pins."""

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.frontier import traps


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


URLS = [
    (1, "http://a.test/p/3/item/9?page=1"),                 # organic
    (2, "http://a.test/a/b/a/b/a/b"),                       # path cycle
    (3, "http://a.test/d/e/f/g/h/i/j/k/9"),                 # depth 9
    (4, "http://a.test/cal/1984/5"),                        # year < 1990
    (5, "http://a.test/cal/2031/5"),                        # plausible year
    (6, "http://a.test/x?phpsessid=abc123"),                # session id
    (7, "http://a.test/x?a=1&b=2&c=3&d=4&e=5&f=6"),         # param burst
    (8, "http://b.test:8081/"),                             # root, no path
    (9, "http://b.test/p/44/item/7?page=2"),                # organic
]


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame(URLS, ["id", "url"])
    out = traps.trap_features(df, keep_cols=["id", "url"])
    return {r["id"]: r for r in out.collect()}


def test_organic_urls_pass(feats):
    for i in (1, 5, 8, 9):
        assert not feats[i]["is_trap"], feats[i]


def test_path_cycle_flagged(feats):
    r = feats[2]
    assert r["depth"] == 6 and r["repeat_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["is_trap"]


def test_depth_flagged(feats):
    assert feats[3]["depth"] == 9 and feats[3]["is_trap"]


def test_calendar_year_window(feats):
    assert feats[4]["calendar_trap"] and feats[4]["is_trap"]
    assert not feats[5]["calendar_trap"]


def test_session_and_param_burst(feats):
    assert feats[6]["has_session"] and feats[6]["is_trap"]
    assert feats[7]["n_params"] == 6 and feats[7]["is_trap"]


def test_empty_path(feats):
    r = feats[8]
    assert r["depth"] == 0 and r["repeat_frac"] == 0.0 and r["n_params"] == 0


def test_trap_features_plan_is_map_only(spark):
    df = spark.createDataFrame(URLS, ["id", "url"])
    plan = _plan(traps.trap_features(df))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_template_cap(spark):
    urls = [(i, f"http://a.test/gen/{i}") for i in range(20)] + [
        (100, "http://a.test/about"),
    ]
    df = spark.createDataFrame(urls, ["id", "url"])
    out = traps.template_cap(df, k=3)
    rows = out.collect()
    gen = [r for r in rows if r["template"] == "a.test/gen/{d}"]
    # URL-ascending pick: /gen/0, /gen/1, /gen/10 (string order)
    assert sorted(r["url"] for r in gen) == [
        "http://a.test/gen/0", "http://a.test/gen/1", "http://a.test/gen/10",
    ]
    assert [r["url"] for r in rows if r["template"] == "a.test/about"] == [
        "http://a.test/about"
    ]
    # map-side partial group limit: the shuffle carries ~k rows/family
    plan = _plan(out)
    assert "WindowGroupLimit" in plan, plan


def test_path_query_parse_matches_urllib(spark):
    """The Catalyst path/query extraction == urllib.parse on randomized
    absolute URLs (ports, empty paths, queries with '?'-like chars in
    fragments, trailing separators)."""
    import random
    from urllib.parse import urlsplit

    rng = random.Random(11)
    hosts = ["a.test", "b.test:8081", "x-y.example.com", "CDN.A.test"]
    schemes = ["http", "https", "HTTP", "Https"]
    seg_pool = ["p", "2024", "a.b", "x_y", "q-r", "07"]
    urls = []
    for i in range(200):
        host = rng.choice(hosts)
        segs = [rng.choice(seg_pool) for _ in range(rng.randrange(0, 5))]
        path = "/" + "/".join(segs) if segs else rng.choice(["", "/"])
        query = rng.choice(["", "?a=1", "?a=1&b=2", "?sid=9"])
        frag = rng.choice(["", "#top", "#x?y=1"])
        urls.append((i, f"{rng.choice(schemes)}://{host}{path}{query}{frag}"))
    df = spark.createDataFrame(urls, ["id", "url"])
    from smart_crawler_spark.frontier.canonical import url_host

    got = {
        r["id"]: (r["p"], r["q"], r["h"])
        for r in df.select(
            "id",
            traps._url_path(F.col("url")).alias("p"),
            traps._url_query(F.col("url")).alias("q"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    }
    for i, u in urls:
        s = urlsplit(u)
        want = (s.path, s.query, s.netloc.lower())
        assert got[i] == want, (u, got[i], want)


def test_mirror_families(spark):
    pages = spark.createDataFrame(
        [
            ("http://a.test/x", "same bytes"),
            ("http://b.test/y", "same bytes"),
            ("http://a.test/z", "same bytes"),   # third copy, host a again
            ("http://a.test/solo", "unique"),
            ("http://c.test/q1", "twice on one host"),
            ("http://c.test/q2", "twice on one host"),  # 1 host -> no family
        ],
        ["url", "text"],
    )
    fams = traps.mirror_families(pages).collect()
    assert len(fams) == 1
    f = fams[0]
    assert f["n_hosts"] == 2 and f["n_urls"] == 3
    assert f["canonical_url"] == "http://a.test/x"
    assert f["hosts"] == "a.test,b.test"


def test_engine_trap_filter(spark, tmp_path):
    """trap_filter=True drops trap URLs at frontier admission (never
    dispatched, never in seen); default off dispatches them — the
    reference-parity behavior."""
    from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
    from smart_crawler_spark.datagen.site import (
        SiteConfig,
        generate_site_pages,
        target_tsv,
    )
    from smart_crawler_spark.sources.targets import load_target_tsv

    cfg = SiteConfig(n_hosts=1, dirs=2, chain=2, details_per_page=2, n_images=6)
    model = load_target_tsv(target_tsv(cfg))
    pages = generate_site_pages(spark, cfg).localCheckpoint()
    trap_seed = f"http://{cfg.host(0)}/detail/1?phpsessid=deadbeef"
    seeds = [f"http://{cfg.host(0)}/", trap_seed]

    res_on = CrawlEngine(
        spark, pages, model, str(tmp_path / "on"),
        EngineConfig(budget_per_host=100, trap_filter=True),
    ).run(seeds)
    assert not [
        r for r in res_on.order.collect() if "phpsessid" in r["url"]
    ]

    res_off = CrawlEngine(
        spark, pages, model, str(tmp_path / "off"),
        EngineConfig(budget_per_host=100),
    ).run(seeds)
    assert [r for r in res_off.order.collect() if "phpsessid" in r["url"]]
    # the filter only removes the trap: the organic crawl is identical
    clean = lambda res: sorted(  # noqa: E731
        r["url"] for r in res.order.collect() if "phpsessid" not in r["url"]
    )
    assert clean(res_on) == clean(res_off)


def test_url_templates(spark):
    df = spark.createDataFrame(URLS, ["id", "url"])
    rows = {r["template"]: r for r in traps.url_templates(df).collect()}
    t = rows["a.test/p/{d}/item/{d}"]
    assert t["n_urls"] == 1 and t["sample_url"] == URLS[0][1]
    both = rows["b.test/p/{d}/item/{d}"]
    assert both["n_urls"] == 1
    # port is part of the host key (two sites on one box stay distinct)
    assert "b.test:8081/" in rows
    # one shuffle: the template agg (plus countDistinct's expand stays
    # inside the same exchange pair)
    plan = _plan(traps.url_templates(df))
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_host_profile(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.test/p/1"),
            (2, "http://a.test/p/2"),
            (3, "http://a.test/x?phpsessid=1"),
            (4, "http://b.test/only"),
        ],
        ["id", "url"],
    )
    rows = {r["host"]: r for r in traps.host_profile(df).collect()}
    a = rows["a.test"]
    assert a["n_urls"] == 3 and a["n_traps"] == 1
    assert a["trap_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert a["n_templates"] == 2  # p/{d} family + /x
    b = rows["b.test"]
    assert b["n_urls"] == 1 and b["n_traps"] == 0 and b["n_templates"] == 1


def test_engine_template_budget(spark, tmp_path):
    """template_budget=N admits at most N new detail URLs per round;
    a generous budget reproduces the unrestricted crawl exactly."""
    from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
    from smart_crawler_spark.datagen.site import (
        SiteConfig,
        generate_site_pages,
        target_tsv,
    )
    from smart_crawler_spark.sources.targets import load_target_tsv

    cfg = SiteConfig(n_hosts=1, dirs=2, chain=1, details_per_page=6, n_images=6)
    model = load_target_tsv(target_tsv(cfg))
    pages = generate_site_pages(spark, cfg).localCheckpoint()
    seeds = [f"http://{cfg.host(0)}/"]

    def detail_urls(res):
        return sorted(
            r["url"] for r in res.order.collect() if "/detail/" in r["url"]
        )

    base = CrawlEngine(
        spark, pages, model, str(tmp_path / "base"),
        EngineConfig(budget_per_host=100),
    ).run(seeds)
    capped = CrawlEngine(
        spark, pages, model, str(tmp_path / "cap"),
        EngineConfig(budget_per_host=100, template_budget=2),
    ).run(seeds)
    wide = CrawlEngine(
        spark, pages, model, str(tmp_path / "wide"),
        EngineConfig(budget_per_host=100, template_budget=10_000),
    ).run(seeds)

    n_base = len(detail_urls(base))
    assert n_base > 2
    # all details share one /detail/{d} family discovered in one round
    assert len(detail_urls(capped)) == 2
    assert detail_urls(wide) == detail_urls(base)
    # the drop is metered, not silent — and absent when the cap is off
    assert (
        sum(m.get("template_dropped", 0) for m in capped.metrics)
        == n_base - 2
    )
    assert all("template_dropped" not in m for m in base.metrics)
    assert sum(m["template_dropped"] for m in wide.metrics) == 0
