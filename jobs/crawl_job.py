"""spark-submit entry point: crawl a deterministic synthetic site.

Cluster (north_rule shape):
    python scripts/package.py
    spark-submit --master <cluster> --py-files dist/smart_crawler_spark.zip \
        jobs/crawl_job.py --hosts 64 --details 8000 --budget 70000 \
        --workdir hdfs:///tmp/crawl --checkpoint-every 1

Local smoke:
    python jobs/crawl_job.py --hosts 4 --details 50 --budget 500 \
        --workdir /tmp/crawl_job

Prints one JSON line with fetched pages, rounds, wall seconds and
fetched URLs/sec. Resume after a kill with --resume (reads the latest
committed snapshot).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs: repo root on sys.path (under spark-submit the --py-files
# zip provides the package instead)
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo, "smart_crawler_spark")):
    sys.path.insert(0, _repo)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hosts", type=int, default=16)
    p.add_argument("--dirs", type=int, default=4)
    p.add_argument("--chain", type=int, default=1)
    p.add_argument("--details", type=int, default=1000)
    p.add_argument("--budget", type=int, default=10_000)
    p.add_argument("--salt-buckets", type=int, default=0)
    p.add_argument("--use-bloom", action="store_true")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument(
        "--keep-snapshots", type=int, default=0,
        help="retain only the newest K committed checkpoint rounds "
        "(0 = keep all)",
    )
    p.add_argument(
        "--compact-sinks", action="store_true",
        help="after the run, rewrite the crawl_order/records sinks "
        "into size-targeted parquet files (rewrite_data_files parity; "
        "row-identical, crash-safe swap)",
    )
    p.add_argument("--resume", action="store_true")
    p.add_argument("--workdir", required=True)
    p.add_argument("--master", default=None, help="only for local runs; "
                   "under spark-submit leave unset")
    p.add_argument(
        "--conf", default=None, metavar="MASTER_CONF",
        help="HOCON run config (reference master.conf dialect, "
        "sources/config.py); its first seed's wait/randompause/"
        "maxfailures and the crawling.pages per-site budget override "
        "the flags",
    )
    args = p.parse_args()

    from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
    from smart_crawler_spark.datagen.site import (
        SiteConfig,
        generate_site_pages,
        target_tsv,
    )
    from smart_crawler_spark.session import spark_session
    from smart_crawler_spark.sources.targets import load_target_tsv

    spark = spark_session(app_name="crawl-job", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    site = SiteConfig(
        n_hosts=args.hosts, dirs=args.dirs, chain=args.chain,
        details_per_page=args.details,
    )
    pages = generate_site_pages(spark, site).localCheckpoint()
    cfg = EngineConfig(
        budget_per_host=args.budget,
        salt_buckets=args.salt_buckets,
        use_bloom=args.use_bloom,
        checkpoint_every=args.checkpoint_every,
        keep_snapshots=args.keep_snapshots,
    )
    if args.conf:
        from smart_crawler_spark.sources.config import load_settings_file

        settings = load_settings_file(args.conf)
        if not settings.seeds:
            # a seedless conf would silently drop the crawling.pages
            # budget the --conf help promises to apply
            raise SystemExit(
                f"--conf {args.conf}: no crawler.modeler seeds configured"
            )
        if settings.seeds:
            seed_cfg = settings.seeds[0]
            cfg = seed_cfg.engine_config(
                settings,
                budget_per_host=args.budget,
                salt_buckets=args.salt_buckets,
                use_bloom=args.use_bloom,
                checkpoint_every=args.checkpoint_every,
            )
    engine = CrawlEngine(
        spark, pages, load_target_tsv(target_tsv(site)), args.workdir, cfg
    )
    seeds = [f"http://{site.host(k)}/" for k in range(site.n_hosts)]
    t0 = time.monotonic()
    res = engine.run(seeds=None if args.resume else seeds, resume=args.resume)
    wall = time.monotonic() - t0
    fetched = res.order.filter("fetched").count()
    report = {
        "fetched": fetched,
        "rounds": res.rounds,
        "wall_sec": round(wall, 2),
        "fetched_urls_per_sec": round(fetched / wall) if wall > 0 else None,
    }
    if args.compact_sinks:
        import os

        from smart_crawler_spark.sources.maintenance import (
            compact_parquet_dir,
        )

        report["compaction"] = {
            name: compact_parquet_dir(
                spark, os.path.join(args.workdir, name)
            )
            for name in ("crawl_order", "records")
        }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
