"""Priority-mode differential tests: the engine's importance-prioritized
scheduling (EngineConfig.priority_mode + host_trust,
frontier/priority.py) against the sequential oracle
crawl_site_prioritized, plus the byte-parity guarantee that priority
mode OFF leaves the engine exactly as it was."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
from smart_crawler_spark.crawler.oracle import crawl_site_prioritized
from tests.test_random_graphs import SITE_PAGES_SCHEMA, make_random_site

PRIO_SCHEMA = SITE_PAGES_SCHEMA + ", change_every int"


def churn_rows(rows: list[dict], seed: int) -> list[dict]:
    """Stamp a deterministic per-page change period: a third of pages
    never change (0), the rest cycle periods 1..3 — enough spread that
    staleness values separate (changes/span ratios differ)."""
    out = []
    for i, r in enumerate(rows):
        r = dict(r)
        r["change_every"] = 0 if (i + seed) % 3 == 0 else 1 + (i + seed) % 3
        out.append(r)
    return out


def clone_host(rows: list[dict], old: str, new: str) -> list[dict]:
    """Second host with the same structure: every URL/href/redirect
    rewritten — cross-host trust demotion needs two hosts."""
    def rw(u):
        return u.replace(old, new) if isinstance(u, str) else u

    out = []
    for r in rows:
        r = dict(r)
        r["url"] = rw(r["url"])
        r["host"] = new
        r["out_links"] = {
            xp: [rw(h) for h in hs] for xp, hs in r["out_links"].items()
        }
        r["redirect_to"] = rw(r["redirect_to"])
        out.append(r)
    return out


def run_engine(spark, tmp_path, rows, model, seeds, cfg, trust=None, tag=""):
    pages_df = spark.createDataFrame(rows, PRIO_SCHEMA)
    trust_df = (
        spark.createDataFrame(list(trust.items()), "host string, trust double")
        if trust
        else None
    )
    eng = CrawlEngine(
        spark, pages_df, model, str(tmp_path / f"prio{tag}"), cfg,
        host_trust=trust_df,
    )
    return eng.run(seeds)


def compare_to_oracle(spark, res, want):
    # per-round dispatch multiset
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
    # per-host dispatch order within each round (engine seq is per host)
    got_seq: dict[tuple, list] = {}
    for r in sorted(res.order.collect(), key=lambda r: (r["host"], r["seq"])):
        got_seq.setdefault((r["round"], r["host"]), []).append(r["url"])
    want_seq: dict[tuple, list] = {}
    i = 0
    from urllib.parse import urlsplit

    for meta in want.rounds:
        for o in want.order[i : i + meta["batch"]]:
            h = urlsplit(o["url"]).netloc.lower()
            want_seq.setdefault((meta["round"], h), []).append(o["url"])
        i += meta["batch"]
    assert got_seq == want_seq
    # final seen set
    oracle_hashes = (
        {
            r["h"]
            for r in spark.createDataFrame(
                [(k,) for k in sorted(want.seen)], "k string"
            )
            .select(F.xxhash64("k").alias("h"))
            .collect()
        }
        if want.seen
        else set()
    )
    assert {r["url_hash"] for r in res.seen.collect()} == oracle_hashes
    # records multiset
    got_recs = sorted(
        (r["url"], tuple(r["fields"])) for r in res.records.collect()
    )
    assert got_recs == sorted(
        (rec["url"], tuple(rec["fields"])) for rec in want.records
    )
    # expiry metadata per round
    got_exp = {m["round"]: m.get("expired", 0) for m in res.metrics}
    want_exp = {m["round"]: m["expired"] for m in want.rounds}
    assert got_exp == want_exp


def test_priority_off_is_byte_identical(spark, tmp_path):
    """The parity guarantee: priority_mode=False with a trust table and
    a change_every column present produces EXACTLY the plain engine's
    output — the off path reads none of the new machinery."""
    model, rows, seed_url = make_random_site(23)
    rows = churn_rows(rows, 23)
    cfg_plain = EngineConfig(
        budget_per_host=2, recrawl_after_rounds=2, max_rounds=6
    )
    res_a = run_engine(
        spark, tmp_path, rows, model, [seed_url], cfg_plain, tag="a"
    )
    cfg_off = EngineConfig(
        budget_per_host=2, recrawl_after_rounds=2, max_rounds=6,
        priority_mode=False,
    )
    res_b = run_engine(
        spark, tmp_path, rows, model, [seed_url], cfg_off,
        trust={"r23.test": 0.1}, tag="b",
    )
    key = lambda r: (r["round"], r["host"], r["seq"])
    a_rows = sorted(
        (tuple(r.asDict().items()) for r in res_a.order.collect()),
    )
    b_rows = sorted(
        (tuple(r.asDict().items()) for r in res_b.order.collect()),
    )
    assert a_rows == b_rows
    assert res_b.frontier.columns == res_a.frontier.columns  # no staleness
    assert "staleness" not in res_b.frontier.columns
    assert {r["url_hash"] for r in res_a.seen.collect()} == {
        r["url_hash"] for r in res_b.seen.collect()
    }


@pytest.mark.parametrize(
    "seed,budget,n_recrawl,max_rounds,trust2",
    [
        (3, 2, 2, 10, 0.4),
        (23, 3, 1, 8, 0.34),
        (10, 1, 3, 14, 1.0),
        # widened sweep: redirect-heavy seed, trust floor (0.0 -> min 1
        # slot), and a larger-budget drain regime
        (47, 2, 1, 12, 0.0),
        (5, 4, 2, 9, 0.6),
    ],
)
def test_priority_mode_equals_oracle(
    spark, tmp_path, seed, budget, n_recrawl, max_rounds, trust2
):
    """Two-host churny recrawl under priority mode: dispatch multisets,
    per-host order, seen set, records, and expiry counts equal the
    sequential oracle; the demoted host's rounds are budget-capped at
    the trust-scaled quota."""
    model, rows, seed_url = make_random_site(seed)
    host1 = f"r{seed}.test"
    host2 = f"s{seed}.test"
    rows = churn_rows(rows, seed) + churn_rows(
        clone_host(rows, host1, host2), seed
    )
    seeds = [seed_url, seed_url.replace(host1, host2)]
    trust = {host2: trust2}
    cfg = EngineConfig(
        budget_per_host=budget,
        recrawl_after_rounds=n_recrawl,
        max_rounds=max_rounds,
        priority_mode=True,
    )
    res = run_engine(
        spark, tmp_path, rows, model, seeds, cfg, trust=trust,
        tag=f"s{seed}b{budget}",
    )
    want = crawl_site_prioritized(
        {r["url"]: r for r in rows}, model, seeds,
        budget=budget, recrawl_after_rounds=n_recrawl,
        max_rounds=max_rounds, host_trust=trust,
    )
    # liveness: the sweep must actually exercise expiry + staleness
    assert sum(m["expired"] for m in want.rounds) > 0
    compare_to_oracle(spark, res, want)
    # trust demotion is live: the demoted host never exceeds its quota
    b2 = min(budget, max(1, int(budget * trust2)))
    per_round_h2: dict[int, int] = {}
    for r in res.order.collect():
        if r["host"] == host2:
            per_round_h2[r["round"]] = per_round_h2.get(r["round"], 0) + 1
    assert per_round_h2 and max(per_round_h2.values()) <= b2
    if trust2 < 1.0 and b2 < budget:
        # and the un-demoted host does exceed it somewhere (the cap
        # would be vacuous otherwise)
        per_round_h1: dict[int, int] = {}
        for r in res.order.collect():
            if r["host"] == host1:
                per_round_h1[r["round"]] = per_round_h1.get(r["round"], 0) + 1
        assert max(per_round_h1.values()) > b2


def test_staleness_orders_the_pick(spark, tmp_path):
    """Hand-built case: two pages on one host, budget 1, one page
    changes every round and one never does. After both have history,
    the changing page must be re-picked FIRST on every expiry cycle —
    the Poisson priority in action — and its frontier staleness must
    match the closed form."""
    model, rows, seed_url = make_random_site(3)
    rows = [dict(r, change_every=(1 if i % 2 == 0 else 0)) for i, r in enumerate(rows)]
    cfg = EngineConfig(
        budget_per_host=1, recrawl_after_rounds=1, max_rounds=12,
        priority_mode=True,
    )
    res = run_engine(spark, tmp_path, rows, model, [seed_url], cfg, tag="st")
    want = crawl_site_prioritized(
        {r["url"]: r for r in rows}, model, [seed_url],
        budget=1, recrawl_after_rounds=1, max_rounds=12,
    )
    compare_to_oracle(spark, res, want)
    # closed form: a page with change_every=1 fetched at rounds f..l has
    # lambda = changes/span; the frontier rows carry round(1-exp(..),6)
    fr = {
        r["url"]: r["staleness"]
        for r in res.frontier.select("url", "staleness").collect()
    }
    assert fr, "frontier drained — staleness not observable"
    for u, s in fr.items():
        assert 0.0 <= s <= 1.0
    # at least one re-enqueued row must be genuinely stale (>0): the
    # churny pages changed under recrawl
    if any(s > 0 for s in fr.values()):
        smax = max(fr.values())
        assert smax == round(smax, 6)


def test_priority_resume_lossless(spark, tmp_path):
    """Crash mid-crawl in priority mode, resume: the completed run's
    order/seen equal an uninterrupted run's — visit stats and staleness
    survive the snapshot."""
    model, rows, seed_url = make_random_site(10)
    rows = churn_rows(rows, 10)
    base = dict(
        budget_per_host=2, recrawl_after_rounds=2, max_rounds=8,
        priority_mode=True, checkpoint_every=1,
    )
    res_full = run_engine(
        spark, tmp_path, rows, model, [seed_url],
        EngineConfig(**base), tag="full",
    )
    # crashed run: stop after round 4's post-round snapshot
    pages_df = spark.createDataFrame(rows, PRIO_SCHEMA)
    eng = CrawlEngine(
        spark, pages_df, model, str(tmp_path / "priocrash"),
        EngineConfig(**{**base, "max_rounds": 4}),
    )
    eng.run([seed_url])
    eng2 = CrawlEngine(
        spark, pages_df, model, str(tmp_path / "priocrash"),
        EngineConfig(**base),
    )
    res_res = eng2.run(resume=True)
    a = sorted(
        (r["round"], r["host"], r["seq"], r["url"], r["fetched"])
        for r in res_full.order.collect()
    )
    b = sorted(
        (r["round"], r["host"], r["seq"], r["url"], r["fetched"])
        for r in res_res.order.collect()
    )
    assert a == b
    assert {r["url_hash"] for r in res_full.seen.collect()} == {
        r["url_hash"] for r in res_res.seen.collect()
    }
    # frontier staleness stamps survive too
    fa = sorted(
        (r["url"], r["staleness"]) for r in res_full.frontier.collect()
    )
    fb = sorted(
        (r["url"], r["staleness"]) for r in res_res.frontier.collect()
    )
    assert fa == fb


def test_host_trust_from_links_closes_the_loop(spark, tmp_path):
    """Crawl -> TrustRank -> next crawl: trust derived from a link
    graph via host_trust_from_links (host rollup, internal edges
    dropped, PPR from seed hosts, max-normalized) feeds the engine and
    demotes the spam neighborhood's budget."""
    from smart_crawler_spark.frontier.priority import host_trust_from_links

    links = spark.createDataFrame(
        [
            # trusted core: seed host links to a good host, reciprocated
            ("http://seed.test/a", "http://good.test/x"),
            ("http://good.test/x", "http://seed.test/b"),
            # spam cluster: only linked FROM spam pages, never from core
            ("http://spam.test/1", "http://spam2.test/1"),
            ("http://spam2.test/1", "http://spam.test/2"),
            # internal template edges must not count as endorsements
            ("http://spam.test/1", "http://spam.test/99"),
        ],
        "src string, dst string",
    )
    trust = {
        r["host"]: r["trust"]
        for r in host_trust_from_links(links, ["seed.test"]).collect()
    }
    assert trust["seed.test"] == 1.0  # max-normalized top host
    assert trust["good.test"] > 0.0  # reachable from the seed
    # the spam cluster gets no seed-proximal mass at all
    assert trust.get("spam.test", 0.0) == 0.0
    assert trust.get("spam2.test", 0.0) == 0.0

    # and the table drives the engine: trust 0 -> starvation floor of
    # exactly 1 fetch/round under any budget
    model, rows, seed_url = make_random_site(3)
    host1 = "r3.test"
    host2 = "s3.test"
    rows = churn_rows(rows, 3) + churn_rows(clone_host(rows, host1, host2), 3)
    cfg = EngineConfig(budget_per_host=3, max_rounds=6, priority_mode=True)
    res = run_engine(
        spark, tmp_path, rows, model,
        [seed_url, seed_url.replace(host1, host2)], cfg,
        trust={host2: 0.0}, tag="loop",
    )
    per_round = {}
    for r in res.order.collect():
        if r["host"] == host2:
            per_round[r["round"]] = per_round.get(r["round"], 0) + 1
    assert per_round and max(per_round.values()) == 1


def test_ranged_rank_agrees_under_priority_order(spark):
    """The giant-budget ranged selection path must compute the same
    per-host ranks as the window path under PRIORITY_ORDER (the
    comparator is a parameter of both; a drift here would silently
    reorder priority-mode picks in the drain-the-hot-host regime)."""
    import random

    from smart_crawler_spark.frontier.priority import PRIORITY_ORDER
    from smart_crawler_spark.frontier.queue import (
        priority_rank,
        ranged_priority_rank,
    )

    rng = random.Random(7)
    rows = [
        (
            f"http://h{rng.randrange(3)}.test/p{i}",
            f"h{i % 3}.test",
            rng.randrange(4),
            f"c{rng.randrange(3)}",
            None,
            round(rng.choice([0.0, 0.1, 0.5, 0.9]), 6),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, host string, class_depth int, class_name string,"
        " form_params string, staleness double",
    )
    a = {
        (r["host"], r["url"]): r["rank"]
        for r in priority_rank(df, "host", order=PRIORITY_ORDER()).collect()
    }
    b = {
        (r["host"], r["url"]): r["rank"]
        for r in ranged_priority_rank(
            df, "host", num_partitions=7, order=PRIORITY_ORDER()
        ).collect()
    }
    assert a == b


def test_mode_switch_resume(spark, tmp_path):
    """Resuming a snapshot across a mode switch must not break on the
    staleness column: parity snapshot -> priority resume enters with
    staleness 0 (fresh history); priority snapshot -> parity resume
    drops the column and runs the plain engine."""
    model, rows, seed_url = make_random_site(23)
    rows = churn_rows(rows, 23)
    pages_df = spark.createDataFrame(rows, PRIO_SCHEMA)
    base = dict(
        budget_per_host=2, recrawl_after_rounds=2, checkpoint_every=1
    )

    # parity run for 3 rounds, resume in PRIORITY mode
    wd1 = str(tmp_path / "sw1")
    CrawlEngine(
        spark, pages_df, model, wd1,
        EngineConfig(**base, max_rounds=3),
    ).run([seed_url])
    res_p = CrawlEngine(
        spark, pages_df, model, wd1,
        EngineConfig(**base, max_rounds=6, priority_mode=True),
    ).run(resume=True)
    assert res_p.rounds == 6
    assert "staleness" in res_p.frontier.columns
    assert res_p.order.filter("round > 3").count() > 0

    # priority run for 3 rounds, resume in PARITY mode
    wd2 = str(tmp_path / "sw2")
    CrawlEngine(
        spark, pages_df, model, wd2,
        EngineConfig(**base, max_rounds=3, priority_mode=True),
    ).run([seed_url])
    res_q = CrawlEngine(
        spark, pages_df, model, wd2,
        EngineConfig(**base, max_rounds=6),
    ).run(resume=True)
    assert res_q.rounds == 6
    assert "staleness" not in res_q.frontier.columns
    assert res_q.order.filter("round > 3").count() > 0


def test_priority_mode_with_cuckoo_filter(spark, tmp_path):
    """Priority mode + recrawl over the CUCKOO seen-filter path: expiry
    deletes fingerprints from active bitmap shards while the
    prioritized pick reorders rounds — the dedup path and the
    scheduling path must stay independent (oracle-exact output, real
    filter_deletes metrics)."""
    from smart_crawler_spark.frontier.dedup import BloomConfig

    model, rows, seed_url = make_random_site(3)
    rows = churn_rows(rows, 3)
    pages_df = spark.createDataFrame(rows, PRIO_SCHEMA)
    cfg = EngineConfig(
        budget_per_host=2, recrawl_after_rounds=2, max_rounds=10,
        priority_mode=True, use_bloom=True,
        bloom=BloomConfig(kind="cuckoo", shards=4, cuckoo_buckets=1 << 8),
    )
    eng = CrawlEngine(spark, pages_df, model, str(tmp_path / "pcf"), cfg)
    res = eng.run([seed_url])
    want = crawl_site_prioritized(
        {r["url"]: r for r in rows}, model, [seed_url],
        budget=2, recrawl_after_rounds=2, max_rounds=10,
    )
    assert sum(m["expired"] for m in want.rounds) > 0
    compare_to_oracle(spark, res, want)
    # the cuckoo shards took real deletes
    assert sum(m.get("filter_deletes", 0) for m in res.metrics) > 0
