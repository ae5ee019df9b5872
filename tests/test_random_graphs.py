"""Property test: on randomly generated model-consistent site graphs —
with dangling links (404s), flaky pages (retries), redirects and
duplicate hrefs — the engine's per-host crawl order, seen set and
records match the reference-semantics oracle EXACTLY."""

import random

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
from smart_crawler_spark.crawler.oracle import crawl_all
from smart_crawler_spark.datagen.site import SITE_PAGES_SCHEMA
from smart_crawler_spark.sources.targets import parse_target_rows


def make_random_site(seed: int):
    rng = random.Random(seed)
    n_classes = rng.randint(3, 4)
    classes = [f"c{i}" for i in range(n_classes)]
    model_rows = []
    # tree edges + random extras, each with its own xpath
    for i in range(1, n_classes):
        src = classes[rng.randrange(i)]
        model_rows.append([src, "link", f"//x{i}", classes[i], "list"])
    for _ in range(rng.randint(1, 3)):
        a, b = rng.sample(range(n_classes), 2)
        model_rows.append(
            [classes[a], "link", f"//e{a}_{b}", classes[b], ""]
        )
    # self-class edge (dir1->dir1next-style pagination): cycles through
    # one class make redirect targets reachable from their own class,
    # the regime where E8 fetch-time seen insertion bites
    s = rng.randrange(n_classes)
    model_rows.append([classes[s], "link", f"//self{s}", classes[s], ""])
    model_rows.append([classes[-1], "string", "//h1/text()", "title"])
    model = parse_target_rows(model_rows)

    pages_by_class = {
        c: [f"http://r{seed}.test/{c}/p{j}" for j in range(rng.randint(1, 4))]
        for c in classes
    }
    edges_by_src: dict[str, list] = {}
    for e in model.class_links:
        edges_by_src.setdefault(e["src_class"], []).append(e)

    rows = []
    for c, urls in pages_by_class.items():
        for u in urls:
            out = {}
            for e in edges_by_src.get(c, []):
                dsts = pages_by_class[e["dst_class"]]
                hrefs = [rng.choice(dsts) for _ in range(rng.randint(0, 3))]
                if rng.random() < 0.2:
                    hrefs.append(f"http://r{seed}.test/dangling/{rng.random()}")
                if hrefs:
                    out[e["xpath"]] = hrefs
            redirect = None
            if rng.random() < 0.15 and len(urls) > 1:
                redirect = rng.choice([x for x in urls if x != u])
            rows.append(
                {
                    "url": u,
                    "host": f"r{seed}.test",
                    "true_class": c,
                    "title": c,
                    "link_schema": sorted(out),
                    "label_schema": [],
                    "out_links": out,
                    "data_values": {"//h1/text()": f"T {u}"},
                    "image_id": None,
                    "caption_xpath": None,
                    "redirect_to": redirect,
                    "fetch_fail_n": 1 if rng.random() < 0.2 else 0,
                }
            )
    seed_url = pages_by_class[model.root][0]
    return model, rows, seed_url


def make_random_multihost_site(seed: int):
    """Random TWO-host graph with cross-host links, form edges
    (POST-sensitive and GET-fallback responses), redirects, dangling
    hrefs and flaky pages — the batch-mode regimes single-host budget=1
    fixtures never reach."""
    from urllib.parse import urlsplit

    rng = random.Random(seed)
    hosts = [f"m{seed}a.test", f"m{seed}b.test"]
    n_classes = rng.randint(3, 5)
    classes = [f"c{i}" for i in range(n_classes)]
    host_of_class = {c: hosts[0] if i == 0 else rng.choice(hosts)
                     for i, c in enumerate(classes)}
    model_rows = []
    form_edges = set()
    for i in range(1, n_classes):
        src = classes[rng.randrange(i)]
        ltype = "form" if rng.random() < 0.3 else "list"
        if ltype == "form":
            form_edges.add(f"//x{i}")
        model_rows.append([src, "link", f"//x{i}", classes[i], ltype])
    for _ in range(rng.randint(1, 3)):
        a, b = rng.sample(range(n_classes), 2)
        model_rows.append([classes[a], "link", f"//e{a}_{b}", classes[b], ""])
    model_rows.append([classes[-1], "string", "//h1/text()", "title"])
    model = parse_target_rows(model_rows)

    pages_by_class = {
        c: [
            f"http://{host_of_class[c]}/{c}/p{j}"
            for j in range(rng.randint(1, 3))
        ]
        for c in classes
    }
    edges_by_src: dict[str, list] = {}
    for e in model.class_links:
        edges_by_src.setdefault(e["src_class"], []).append(e)

    rows = []
    post_rows = []
    for c, urls in pages_by_class.items():
        for u in urls:
            out = {}
            for e in edges_by_src.get(c, []):
                dsts = pages_by_class[e["dst_class"]]
                hrefs = []
                for _ in range(rng.randint(0, 3)):
                    dst = rng.choice(dsts)
                    if e["xpath"] in form_edges:
                        params = f"q={rng.randint(0, 2)};"
                        hrefs.append(dst + ">" + params)
                        # ~half the param sets get their own
                        # POST-response row; the rest fall back to the
                        # GET page's content (CrawlPage.fetchUrl:135-141)
                        if rng.random() < 0.5:
                            post_rows.append((dst + ">" + params,
                                              e["dst_class"]))
                    else:
                        hrefs.append(dst)
                if rng.random() < 0.2:
                    hrefs.append(
                        f"http://{rng.choice(hosts)}/dangling/{rng.random()}"
                    )
                if hrefs:
                    out[e["xpath"]] = hrefs
            redirect = None
            if rng.random() < 0.15 and len(urls) > 1:
                redirect = rng.choice([x for x in urls if x != u])
            rows.append(
                {
                    "url": u,
                    "host": urlsplit(u).netloc,
                    "true_class": c,
                    "title": c,
                    "link_schema": sorted(out),
                    "label_schema": [],
                    "out_links": out,
                    "data_values": {"//h1/text()": f"T {u}"},
                    "image_id": None,
                    "caption_xpath": None,
                    "redirect_to": redirect,
                    "fetch_fail_n": 1 if rng.random() < 0.15 else 0,
                }
            )
    for post_url, cls in dict(post_rows).items():
        rows.append(
            {
                "url": post_url,
                "host": urlsplit(post_url.split(">", 1)[0]).netloc,
                "true_class": cls,
                "title": cls,
                "link_schema": [],
                "label_schema": [],
                "out_links": {},
                "data_values": {"//h1/text()": f"P {post_url}"},
                "image_id": None,
                "caption_xpath": None,
                "redirect_to": None,
                "fetch_fail_n": 0,
            }
        )
    seed_url = pages_by_class[model.root][0]
    return model, rows, seed_url


@pytest.mark.parametrize("seed", [11, 42])
@pytest.mark.parametrize("budget", [1, 3])
def test_engine_equals_oracle_on_random_multihost_graph(
    spark, tmp_path, seed, budget
):
    """Batch-mode invariants on random multi-host+form graphs: the
    engine's dispatch multiset (url, class, fetched), final seen set and
    record multiset equal the sequential oracle's, for any per-host
    round budget (exact ORDER parity is only claimed for budget=1
    single-host — rounds interleave hosts differently than the oracle's
    single sequential frontier)."""
    model, rows, seed_url = make_random_multihost_site(seed)
    pages_df = spark.createDataFrame(rows, SITE_PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages_df, model, str(tmp_path / f"m{seed}b{budget}"),
        EngineConfig(budget_per_host=budget),
    )
    res = eng.run([seed_url])
    want = crawl_all(rows, model, [seed_url])
    host = next(iter(want))

    got_disp = sorted(
        (r["url"], r["page_class"], r["fetched"])
        for r in res.order.collect()
    )
    assert got_disp == sorted(
        (o["url"], o["page_class"], o["fetched"]) for o in want[host].order
    )
    # every frontier row carries its URL's OWN authority
    for r in res.order.collect():
        assert r["host"] == r["url"].split("/")[2], r

    oracle_hashes = {
        r["h"]
        for r in spark.createDataFrame(
            [(k,) for k in sorted(want[host].seen)], "k string"
        ).select(F.xxhash64("k").alias("h")).collect()
    }
    assert {r["url_hash"] for r in res.seen.collect()} == oracle_hashes

    got_recs = sorted(
        (r["url"], r["page_class"], tuple(r["fields"]))
        for r in res.records.collect()
    )
    assert got_recs == sorted(
        (rec["url"], rec["page_class"], tuple(rec["fields"]))
        for rec in want[host].records
    )


def _order_seen_records(res):
    order = [
        (r["seq"], r["url"], r["page_class"], r["fetched"])
        for r in res.order.orderBy("seq").collect()
    ]
    seen = sorted(r["url_hash"] for r in res.seen.collect())
    records = sorted(
        (r["url"], r["page_class"], tuple(r["fields"]))
        for r in res.records.collect()
    )
    return order, seen, records


def _oracle_order_seen_records(spark, want_one):
    order = [
        (o["seq"], o["url"], o["page_class"], o["fetched"])
        for o in want_one.order
    ]
    seen = sorted(
        r["h"]
        for r in spark.createDataFrame(
            [(k,) for k in sorted(want_one.seen)], "k string"
        ).select(F.xxhash64("k").alias("h")).collect()
    )
    records = sorted(
        (rec["url"], rec["page_class"], tuple(rec["fields"]))
        for rec in want_one.records
    )
    return order, seen, records


@pytest.mark.parametrize(
    "seed,budget,n_recrawl,max_rounds",
    # seeds chosen so every sweep point actually expires entries
    # (liveness asserted below — a drained-before-expiry graph would
    # test nothing)
    [(3, 1, 2, 12), (23, 3, 1, 8), (10, 2, 3, 15), (47, 1, 1, 20)],
)
def test_random_graph_recrawl_equals_oracle(
    spark, tmp_path, seed, budget, n_recrawl, max_rounds
):
    """Recrawl-expiry sweep: the engine's per-round dispatch multiset,
    final seen set, record multiset, and per-round expiry counts equal
    the round-based oracle (crawl_site_recrawl); cuckoo bitmap shards
    take real deletes (filter_deletes metric) and the prefilter still
    agrees with the exact path afterwards (the dedup would diverge on a
    wrongly-deleted fingerprint)."""
    from smart_crawler_spark.crawler.oracle import crawl_site_recrawl
    from smart_crawler_spark.frontier.dedup import BloomConfig

    model, rows, seed_url = make_random_site(seed)
    pages_df = spark.createDataFrame(rows, SITE_PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages_df, model,
        str(tmp_path / f"rc{seed}b{budget}n{n_recrawl}"),
        EngineConfig(
            budget_per_host=budget,
            recrawl_after_rounds=n_recrawl,
            max_rounds=max_rounds,
            use_bloom=True,
            bloom=BloomConfig(kind="cuckoo", shards=4, cuckoo_buckets=1 << 8),
        ),
    )
    res = eng.run([seed_url])
    want = crawl_site_recrawl(
        {r["url"]: r for r in rows}, model, seed_url,
        budget=budget, recrawl_after_rounds=n_recrawl, max_rounds=max_rounds,
    )

    # per-round dispatch multiset (budget=1 makes it the exact order)
    got_rounds: dict[int, list] = {}
    for r in res.order.collect():
        got_rounds.setdefault(r["round"], []).append(
            (r["url"], r["page_class"], r["fetched"])
        )
    want_rounds: dict[int, list] = {}
    i = 0
    for meta in want.rounds:
        chunk = want.order[i : i + meta["batch"]]
        i += meta["batch"]
        want_rounds[meta["round"]] = [
            (o["url"], o["page_class"], o["fetched"]) for o in chunk
        ]
    assert {k: sorted(v) for k, v in got_rounds.items()} == {
        k: sorted(v) for k, v in want_rounds.items()
    }

    # final seen set
    oracle_hashes = {
        r["h"]
        for r in spark.createDataFrame(
            [(k,) for k in sorted(want.seen)], "k string"
        ).select(F.xxhash64("k").alias("h")).collect()
    } if want.seen else set()
    assert {r["url_hash"] for r in res.seen.collect()} == oracle_hashes

    # records multiset (recrawled pages re-extract their records)
    got_recs = sorted(
        (r["url"], tuple(r["fields"])) for r in res.records.collect()
    )
    assert got_recs == sorted(
        (rec["url"], tuple(rec["fields"])) for rec in want.records
    )

    # expiry metadata: engine metrics mirror the oracle per round, and
    # the cuckoo shards saw real deletes somewhere in the run
    got_exp = [(m["round"], m["expired"]) for m in res.metrics]
    want_exp = [(m["round"], m["expired"]) for m in want.rounds]
    assert got_exp == want_exp
    assert sum(m["filter_deletes"] for m in res.metrics) == sum(
        m["expired"] for m in want.rounds
    )
    assert sum(m["expired"] for m in want.rounds) > 0  # sweep is live


@pytest.mark.parametrize("seed,cap", [(5, 3), (31, 7)])
def test_random_graph_page_budget_counts_dispatches(spark, tmp_path, seed, cap):
    """F5 on random graphs: the per-host page cap counts DISPATCHES
    (pageCount++ in sendURL, CrawlFrontier.java:132-139), so with 20 %
    flaky pages and max_tries=1 a failed fetch still consumes budget —
    order parity must hold exactly at the truncation point."""
    model, rows, seed_url = make_random_site(seed)
    pages_df = spark.createDataFrame(rows, SITE_PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages_df, model, str(tmp_path / f"cap{seed}"),
        EngineConfig(budget_per_host=1, max_pages_per_host=cap),
    )
    res = eng.run([seed_url])
    want = crawl_all(rows, model, [seed_url], max_pages=cap)
    host = next(iter(want))
    assert _order_seen_records(res) == _oracle_order_seen_records(
        spark, want[host]
    )
    assert res.order.count() <= cap


@pytest.mark.parametrize("seed", [13, 57])
def test_random_graph_resume_equals_uninterrupted(spark, tmp_path, seed):
    """Lossless resume on random graphs: crash right after the round-2
    mid-round snapshot (batch in flight), resume in a new engine, and the
    final order/seen/records still equal the sequential oracle's."""
    model, rows, seed_url = make_random_site(seed)
    pages_df = spark.createDataFrame(rows, SITE_PAGES_SCHEMA)
    wd = str(tmp_path / f"res{seed}")
    # keep_snapshots=1: snapshot retention must never lose the resume
    # point — sweep it on the same random shapes as the resume itself
    CrawlEngine(
        spark, pages_df, model, wd,
        EngineConfig(budget_per_host=1, checkpoint_every=1,
                     crash_at_round=2, keep_snapshots=1),
    ).run([seed_url])
    resumed = CrawlEngine(
        spark, pages_df, model, wd,
        EngineConfig(budget_per_host=1, checkpoint_every=1,
                     keep_snapshots=1),
    ).run(resume=True)
    want = crawl_all(rows, model, [seed_url])
    host = next(iter(want))
    assert _order_seen_records(resumed) == _oracle_order_seen_records(
        spark, want[host]
    )


@pytest.mark.parametrize("seed", [19])
def test_random_graph_bloom_matches_exact(spark, tmp_path, seed):
    """F1 path equivalence on a random multi-host graph: the bloom
    prefilter (probe + confirm anti-join) and the plain exact anti-join
    must produce identical dispatch multisets and seen sets — the
    prefilter may only prune definitely-new keys, never answer seen."""
    model, rows, seed_url = make_random_multihost_site(seed)
    pages_df = spark.createDataFrame(rows, SITE_PAGES_SCHEMA)
    outs = []
    for name, use_bloom in (("exact", False), ("bloom", True)):
        res = CrawlEngine(
            spark, pages_df, model, str(tmp_path / f"{name}{seed}"),
            EngineConfig(budget_per_host=2, use_bloom=use_bloom),
        ).run([seed_url])
        outs.append(
            (
                sorted(
                    (r["url"], r["page_class"], r["fetched"])
                    for r in res.order.collect()
                ),
                sorted(r["url_hash"] for r in res.seen.collect()),
            )
        )
    assert outs[0] == outs[1]


@pytest.mark.parametrize("seed", [7, 23])
@pytest.mark.parametrize("max_tries", [1, 2])
def test_engine_equals_oracle_on_random_graph(spark, tmp_path, seed, max_tries):
    model, rows, seed_url = make_random_site(seed)
    pages_df = spark.createDataFrame(rows, SITE_PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages_df, model, str(tmp_path / f"s{seed}t{max_tries}"),
        EngineConfig(budget_per_host=1, max_tries=max_tries),
    )
    res = eng.run([seed_url])
    want = crawl_all(rows, model, [seed_url], max_tries=max_tries)

    host = next(iter(want))
    got_order = [
        (r["seq"], r["url"], r["page_class"], r["fetched"])
        for r in res.order.orderBy("seq").collect()
    ]
    assert got_order == [
        (o["seq"], o["url"], o["page_class"], o["fetched"])
        for o in want[host].order
    ]
    oracle_hashes = {
        r["h"]
        for r in spark.createDataFrame(
            [(k,) for k in sorted(want[host].seen)], "k string"
        ).select(F.xxhash64("k").alias("h")).collect()
    }
    assert {r["url_hash"] for r in res.seen.collect()} == oracle_hashes
    got_recs = sorted(
        (r["url"], tuple(r["fields"])) for r in res.records.collect()
    )
    assert got_recs == sorted(
        (rec["url"], tuple(rec["fields"])) for rec in want[host].records
    )


@pytest.mark.parametrize("seed", [3, 47])
def test_random_graph_robots_equals_pruned_oracle(spark, tmp_path, seed):
    """Robots integration on random graphs: the engine under a
    Disallow-list policy produces exactly the oracle's crawl of the SAME
    graph with the disallowed URLs pruned from every href list and the
    seed list — blocked URLs never consume budget, never enter the
    frontier or the seen set, and the dispatch ORDER of the surviving
    URLs is untouched."""
    import copy
    from urllib.parse import urlsplit

    from smart_crawler_spark.frontier.robots import RobotsPolicy

    model, rows, seed_url = make_random_site(seed)
    rng = random.Random(seed * 31 + 7)
    candidates = sorted(r["url"] for r in rows if r["url"] != seed_url)
    blocked = set(rng.sample(candidates, max(1, len(candidates) // 4)))

    by_host: dict[str, list[str]] = {}
    for u in sorted(blocked):
        parts = urlsplit(u)
        by_host.setdefault(parts.netloc, []).append(parts.path + "$")
    policy = RobotsPolicy(
        {
            h: "User-agent: *\n" + "\n".join(f"Disallow: {p}" for p in ps)
            for h, ps in by_host.items()
        }
    )

    pages_df = spark.createDataFrame(rows, SITE_PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages_df, model, str(tmp_path / f"rob{seed}"),
        EngineConfig(budget_per_host=1), robots=policy,
    )
    res = eng.run([seed_url])

    pruned = copy.deepcopy(rows)
    for r in pruned:
        r["out_links"] = {
            xp: [h for h in hrefs if h not in blocked]
            for xp, hrefs in r["out_links"].items()
        }
        r["out_links"] = {xp: hs for xp, hs in r["out_links"].items() if hs}
        r["link_schema"] = sorted(r["out_links"])
    want = crawl_all(pruned, model, [seed_url])
    host = next(iter(want))
    assert _order_seen_records(res) == _oracle_order_seen_records(
        spark, want[host]
    )
