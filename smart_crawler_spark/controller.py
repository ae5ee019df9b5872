"""Multi-site run controller — the reference's Entry A
(``CrawlController.java:42-80``): one parsed ``master.conf`` drives
every configured site through *model resolution* (static target file OR
dynamic modeling when ``dynamic.pages > 0``) and then, for seeds with
``crawl = true``, a crawl with the per-seed politeness/retry settings
and the global ``crawling.pages`` budget.

Spark shape: one SparkSession hosts all sites; each site's crawl is its
own engine run (the reference starts one CrawlFrontier per site). Site
corpora are injected (hermetic fetch) via ``SiteRuntime``; a live
deployment would swap the fetcher while keeping this control flow.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from smart_crawler_spark.crawler.engine import CrawlEngine, CrawlResult
from smart_crawler_spark.modeler.dynamic import CorpusFetcher, DynamicModeler
from smart_crawler_spark.sources.config import CrawlerSettings, SeedConfig
from smart_crawler_spark.sources.targets import (
    NavigationModel,
    load_target_file,
)


@dataclass
class SiteRuntime:
    """Hermetic per-site corpus: ``rows`` feed the modeler's fetcher and
    the pure-Python oracle; ``pages`` is the engine's Spark corpus."""

    rows: list[dict]
    pages: DataFrame
    html_of: object | None = None  # row -> html (real-HTML corpora)


@dataclass
class SiteOutcome:
    model: NavigationModel
    result: CrawlResult | None  # None when the seed has crawl = false


def resolve_model(seed: SeedConfig, runtime: SiteRuntime) -> NavigationModel:
    """Static target file wins; else dynamic modeling with the seed's
    page budget (``CrawlController.startCrawling`` dispatch)."""
    if seed.file:
        return load_target_file(seed.file)
    if seed.model_pages <= 0:
        raise ValueError(
            f"seed {seed.site!r} has neither static.file nor dynamic.pages"
        )
    dm = DynamicModeler(
        CorpusFetcher(runtime.rows, html_of=runtime.html_of),
        seed.site,
        model_pages=seed.model_pages,
    )
    return dm.run()


def run_settings(
    spark: SparkSession,
    settings: CrawlerSettings,
    runtimes: dict[str, SiteRuntime],
    workdir: str,
    **engine_overrides,
) -> dict[str, SiteOutcome]:
    """Model + (optionally) crawl every configured seed in one session.

    ``runtimes`` maps each seed's site string to its corpus. Engine
    overrides (e.g. ``budget_per_host``) apply on top of the per-seed
    config mapping (wait/randompause/maxfailures + global pages budget,
    ``SeedConfig.engine_config``)."""
    out: dict[str, SiteOutcome] = {}
    for i, seed in enumerate(settings.seeds):
        runtime = runtimes[seed.site]
        model = resolve_model(seed, runtime)
        result = None
        if seed.crawl:
            cfg = seed.engine_config(settings, **engine_overrides)
            engine = CrawlEngine(
                spark,
                runtime.pages,
                model,
                os.path.join(workdir, f"site_{i}"),
                cfg,
            )
            result = engine.run([seed.site.rstrip("/") + "/"])
        out[seed.site] = SiteOutcome(model=model, result=result)
    return out
