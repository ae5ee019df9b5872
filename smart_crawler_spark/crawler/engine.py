"""The crawl engine: bulk-synchronous rounds over DataFrame state
(SURVEY §3.2 — each reference actor round-trip becomes one stage of a
round; all rounds append to parquet sinks).

One round:

    batch    = top-K per host of the frontier under the reference's
               total order (F2 priority + F4 politeness budget)
    fetched  = batch ⋈ site_pages (S2; retries/redirects resolved)
    order   += per-host sequence numbers of the batch          (sink)
    records += model-driven field extraction (E4–E7)           (sink)
    links    = explode out_links ⋈ broadcast(model)  (E1/E3)
    new      = links deduped intra-batch (sequential-enqueue order)
               then against the sharded seen set (F1)
    frontier = (frontier ∖ batch) ∪ new;  seen ∪= new          (F8)
    snapshot(frontier, seen, in_flight, per-partition metrics) (S8)

With ``budget_per_host=1`` the per-host dequeue order equals the
reference's sequential best-first order exactly (pinned by tests against
the oracle). Larger budgets are the scale mode: same seen-set, same
records, rounds shrink by the politeness budget factor.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from smart_crawler_spark.crawler.extract import (
    extract_links,
    extract_records,
    fetch_batch_resolved,
    resolve_redirects,
)
from smart_crawler_spark.frontier.canonical import (
    canonical_relative_url,
    url_host,
    url_seen_key,
)
from smart_crawler_spark.frontier.checkpoint import CrawlCheckpoint, partition_metrics
from smart_crawler_spark.frontier.dedup import BloomConfig, SeenFilter
from smart_crawler_spark.frontier.queue import FRONTIER_ORDER, priority_rank

FRONTIER_SCHEMA = (
    "url string, host string, page_class string, class_depth int,"
    " class_name string, form_params string"
)


@dataclass
class EngineConfig:
    budget_per_host: int = 1
    max_pages_per_host: int = 1 << 30
    max_tries: int = 1
    salt_buckets: int = 0
    use_bloom: bool = False
    bloom: BloomConfig = field(default_factory=BloomConfig)
    checkpoint_every: int = 0  # 0 = no checkpointing
    crash_at_round: int | None = None  # stop right after that round's snapshot
    # politeness (F4): when wait_ms > 0, the per-host budget is derived
    # from the round duration instead of budget_per_host — the reference
    # sleeps wait + U[0, random_pause) between per-host fetches
    # (CrawlFrontier.java:132-139; defaults CrawlerSettings.java:49-50)
    wait_ms: int = 0
    random_pause_ms: int = 0
    round_ms: int = 60_000

    def effective_budget(self) -> int:
        from smart_crawler_spark.frontier.queue import politeness_budget

        if self.wait_ms or self.random_pause_ms:
            return min(
                self.budget_per_host if self.budget_per_host > 1 else 1 << 30,
                politeness_budget(self.round_ms, self.wait_ms, self.random_pause_ms),
            )
        return self.budget_per_host


@dataclass
class CrawlResult:
    rounds: int
    order: DataFrame
    records: DataFrame
    seen: DataFrame
    frontier: DataFrame
    metrics: list[dict]


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        site_pages: DataFrame,
        model,
        workdir: str,
        cfg: EngineConfig | None = None,
        robots=None,
    ):
        self.spark = spark
        # redirect adoption is corpus-static: resolve once, materialize,
        # so each round's fetch is a single equi-join (E8)
        self.site_pages = resolve_redirects(site_pages).localCheckpoint(eager=True)
        self.model = model
        self.workdir = workdir
        self.cfg = cfg or EngineConfig()
        self.class_links = model.class_links_df(spark)
        self.data_links = model.data_links_df(spark)
        self.checkpoint = (
            CrawlCheckpoint(spark, os.path.join(workdir, "checkpoints"))
            if self.cfg.checkpoint_every
            else None
        )
        self._order_dir = os.path.join(workdir, "crawl_order")
        self._records_dir = os.path.join(workdir, "records")
        # robots.txt (RobotsPolicy | None): disallowed URLs never enter
        # the frontier or the seen set; per-host Crawl-delay tightens the
        # politeness budget (round_ms / delay fetches per round)
        self.robots = robots
        self._host_delay_budgets: dict[str, int] = {}
        if robots is not None:
            for h, delay_ms in robots.crawl_delays_ms().items():
                if delay_ms > 0:
                    self._host_delay_budgets[h] = max(
                        1, self.cfg.round_ms // delay_ms
                    )

    # -- seed bootstrap --------------------------------------------------
    def seed_frontier(self, seeds: list[str]) -> DataFrame:
        root = self.model.root
        depth = self.model.depths[root]
        df = self.spark.createDataFrame(
            [(u, root, depth, root, None) for u in seeds],
            "url string, page_class string, class_depth int, class_name string,"
            " form_params string",
        )
        return df.withColumn("host", url_host("url")).select(
            "url", "host", "page_class", "class_depth", "class_name", "form_params"
        )

    # -- main loop --------------------------------------------------------
    def run(self, seeds: list[str] | None = None, resume: bool = False) -> CrawlResult:
        cfg = self.cfg
        seen_filter = SeenFilter(self.spark, cfg.bloom, use_bloom=cfg.use_bloom)
        metrics: list[dict] = []

        def robots_ok(df: DataFrame) -> DataFrame:
            if self.robots is None:
                return df
            from smart_crawler_spark.frontier.robots import filter_allowed

            return filter_allowed(df, self.robots)

        if resume:
            snap = self.checkpoint.latest()
            if snap is None:
                raise RuntimeError("resume requested but no committed snapshot")
            frontier = self.checkpoint.resume_frontier(snap).localCheckpoint()
            seen_filter.seen = snap.seen.localCheckpoint()
            if cfg.use_bloom and snap.seen.take(1):
                seen_filter.blooms = seen_filter._build_blooms(
                    seen_filter._with_shard(snap.seen.select("url_hash"))
                ).localCheckpoint()
            host_seq = {k: int(v) for k, v in snap.extras["host_seq"].items()}
            host_fetched = {
                k: int(v) for k, v in snap.extras["host_fetched"].items()
            }
            rnd = snap.round
        else:
            frontier = robots_ok(self.seed_frontier(seeds)).localCheckpoint()
            seed_hashes = frontier.select(
                url_seen_key(F.col("url"), F.col("form_params")).alias("url_hash")
            )
            seen_filter.add(seed_hashes)
            seen_filter.materialize()
            host_seq, host_fetched, rnd = {}, {}, 0

        while True:
            rnd += 1
            batch = self._pick_batch(frontier, host_fetched)
            batch = batch.localCheckpoint(eager=True)
            if batch.isEmpty():
                rnd -= 1
                break
            t0 = time.monotonic()

            # null-safe key: the same URL may sit in the frontier twice
            # with different form params (distinct pages per F1 identity)
            fp_key = F.coalesce(F.col("form_params"), F.lit(""))
            frontier = frontier.withColumn("_fp", fp_key).join(
                batch.select("url", "page_class", fp_key.alias("_fp")),
                ["url", "page_class", "_fp"],
                "left_anti",
            ).drop("_fp")

            if self.checkpoint and (
                rnd % cfg.checkpoint_every == 0 or cfg.crash_at_round == rnd
            ):
                frontier = frontier.localCheckpoint(eager=True)
                self._snapshot(rnd, frontier, seen_filter, batch, host_seq, host_fetched)
                if cfg.crash_at_round == rnd:
                    # simulated mid-round kill: batch is in flight, its
                    # links/records not yet produced
                    return self._result(rnd, frontier, seen_filter, metrics)

            fetched = fetch_batch_resolved(batch, self.site_pages, cfg.max_tries)
            fetched = fetched.localCheckpoint(eager=True)
            fetched_ok = fetched.filter("fetch_ok")

            # the two sinks and the link-dedup pipeline are independent
            # given the materialized batch — run them as concurrent Spark
            # jobs (round wall time = max, not sum; on a cluster these
            # schedule onto free executor slots)
            from concurrent.futures import ThreadPoolExecutor

            def _write_order():
                self._append_order(rnd, fetched, host_seq)

            def _write_records():
                extract_records(fetched_ok, self.data_links).withColumn(
                    "round", F.lit(rnd)
                ).write.mode("append").parquet(self._records_dir)

            def _new_links():
                links = extract_links(fetched_ok, self.class_links)
                new = self._dedup_links(robots_ok(links), seen_filter)
                return new.localCheckpoint(eager=True)

            with ThreadPoolExecutor(3) as pool:
                f_order = pool.submit(_write_order)
                f_records = pool.submit(_write_records)
                f_new = pool.submit(_new_links)
                f_order.result()
                f_records.result()
                new = f_new.result()
            n_new = new.count()

            frontier = frontier.unionByName(
                new.select(*frontier.columns)
            ).localCheckpoint(eager=True)
            # redirect targets join the seen set (E8: the adopted final
            # URL is treated as visited, CrawlPage.java:55,140-141)
            redirect_hashes = fetched_ok.filter(
                F.col("redirect_to").isNotNull()
            ).select(url_seen_key(F.col("final_url")).alias("url_hash"))
            seen_filter.add(
                new.select("url_hash").unionByName(redirect_hashes)
            )
            seen_filter.materialize()

            # one combined per-host count pass (batch sizes + fetch-ok)
            host_rows = (
                fetched.groupBy("host")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count_if(F.col("fetch_ok")).alias("ok_n"),
                )
                .collect()
            )
            batch_hosts = {r["host"]: r["n"] for r in host_rows}
            ok_hosts = {r["host"]: r["ok_n"] for r in host_rows if r["ok_n"]}
            for h, n in batch_hosts.items():
                host_seq[h] = host_seq.get(h, 0) + n
            for h, n in ok_hosts.items():
                host_fetched[h] = host_fetched.get(h, 0) + n
            metrics.append(
                {
                    "round": rnd,
                    "batch": sum(batch_hosts.values()),
                    "fetched": sum(ok_hosts.values()),
                    "new_urls": n_new,
                    "sec": time.monotonic() - t0,
                }
            )
            if self.checkpoint and rnd % cfg.checkpoint_every == 0:
                # post-round snapshot (in-flight drained)
                self._snapshot(
                    rnd, frontier, seen_filter, None, host_seq, host_fetched
                )

        return self._result(rnd, frontier, seen_filter, metrics)

    # -- stages -----------------------------------------------------------
    def _pick_batch(self, frontier: DataFrame, host_fetched: dict) -> DataFrame:
        cfg = self.cfg
        budget = cfg.effective_budget()
        df = frontier
        if cfg.salt_buckets > 1:
            df = df.withColumn(
                "_salt",
                F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets)).cast("int"),
            )
            w1 = Window.partitionBy("host", "_salt").orderBy(*FRONTIER_ORDER())
            df = (
                df.withColumn("_r1", F.row_number().over(w1))
                .filter(F.col("_r1") <= budget)
                .drop("_salt", "_r1")
            )
        ranked = priority_rank(df, "host")
        if self._host_delay_budgets:
            # robots Crawl-delay: per-host budget = round_ms / delay
            hb = self.spark.createDataFrame(
                list(self._host_delay_budgets.items()), "host string, _hb int"
            )
            ranked = (
                ranked.join(F.broadcast(hb), "host", "left")
                .filter(F.col("rank") <= F.least(F.lit(budget), F.coalesce("_hb", F.lit(budget))))
                .drop("_hb")
            )
            budget_applied = True
        else:
            budget_applied = False
        if cfg.max_pages_per_host >= (1 << 30):
            # unbounded: skip the remaining-budget join entirely
            if budget_applied:
                return ranked.drop("rank")
            return ranked.filter(F.col("rank") <= budget).drop("rank")
        if host_fetched:
            rem = self.spark.createDataFrame(
                [
                    (h, max(cfg.max_pages_per_host - n, 0))
                    for h, n in host_fetched.items()
                ],
                "host string, rem int",
            )
            ranked = ranked.join(F.broadcast(rem), "host", "left").withColumn(
                "rem", F.coalesce("rem", F.lit(cfg.max_pages_per_host))
            )
        else:
            ranked = ranked.withColumn("rem", F.lit(cfg.max_pages_per_host))
        return ranked.filter(
            (F.col("rank") <= F.least(F.lit(budget), F.col("rem")))
            & (F.col("rem") > 0)
        ).drop("rem")

    def _dedup_links(self, links: DataFrame, seen_filter: SeenFilter) -> DataFrame:
        # intra-batch: first enqueuer wins, in the order the reference's
        # sequential loop would enqueue (source priority, then link_seq)
        cand = links.withColumn(
            "rel", canonical_relative_url(F.col("url"), F.col("form_params"))
        )
        w = Window.partitionBy("host", "rel").orderBy(
            F.col("src_depth").asc(),
            F.col("src_class").asc(),
            F.col("src_url").asc(),
            F.col("link_seq").asc(),
        )
        first = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "rel", "src_depth", "src_class", "src_url", "link_seq")
        )
        first = first.withColumn(
            "url_hash", url_seen_key(F.col("url"), F.col("form_params"))
        )
        return seen_filter.filter_new(first)

    def _append_order(self, rnd: int, fetched: DataFrame, host_seq: dict) -> None:
        base = (
            self.spark.createDataFrame(
                list(host_seq.items()), "host string, base long"
            )
            if host_seq
            else None
        )
        df = fetched.withColumn(
            "rank", F.row_number().over(Window.partitionBy("host").orderBy(*FRONTIER_ORDER()))
        )
        if base is not None:
            df = df.join(F.broadcast(base), "host", "left").withColumn(
                "base", F.coalesce("base", F.lit(0))
            )
        else:
            df = df.withColumn("base", F.lit(0))
        df.select(
            F.lit(rnd).alias("round"),
            "host",
            (F.col("base") + F.col("rank")).cast("long").alias("seq"),
            "url",
            F.col("page_class"),
            F.col("fetch_ok").alias("fetched"),
        ).write.mode("append").parquet(self._order_dir)

    def _snapshot(self, rnd, frontier, seen_filter, in_flight, host_seq, host_fetched):
        in_flight_df = (
            in_flight
            if in_flight is not None
            else self.spark.createDataFrame([], frontier.schema)
        )
        m = partition_metrics(frontier, "frontier_rows").withColumn(
            "round", F.lit(rnd)
        )
        self.checkpoint.write(
            rnd,
            frontier,
            seen_filter.seen,
            in_flight_df.select(*frontier.columns),
            m,
            extras={"host_seq": host_seq, "host_fetched": host_fetched},
        )

    def _result(self, rnd, frontier, seen_filter, metrics) -> CrawlResult:
        empty_order = self.spark.createDataFrame(
            [], "round int, host string, seq long, url string,"
            " page_class string, fetched boolean",
        )
        empty_records = self.spark.createDataFrame(
            [], "url string, page_class string, host string,"
            " fields array<string>, round int",
        )
        order = (
            self.spark.read.parquet(self._order_dir)
            if os.path.isdir(self._order_dir)
            else empty_order
        )
        records = (
            self.spark.read.parquet(self._records_dir)
            if os.path.isdir(self._records_dir)
            else empty_records
        )
        return CrawlResult(
            rounds=rnd,
            order=order,
            records=records,
            seen=seen_filter.seen,
            frontier=frontier,
            metrics=metrics,
        )
