"""spark-submit entry point for Entry A: one HOCON master.conf, many
sites, one session (``CrawlController.java:42-80`` flow via
``smart_crawler_spark.controller``).

Each configured seed gets a deterministic synthetic fixture site named
after its host (the hermetic stand-in for live HTTP); seeds with
``dynamic.pages > 0`` are modeled with the DynamicModeler before
crawling, seeds with ``static.file`` load their target file.

Local smoke:
    python jobs/controller_job.py --conf my_master.conf \
        --workdir /tmp/controller_job --details 50

Cluster:
    python scripts/package.py
    spark-submit --master <cluster> --py-files dist/smart_crawler_spark.zip \
        jobs/controller_job.py --conf master.conf --workdir hdfs:///tmp/run

Prints one JSON line per site: modeled classes, fetched pages, rounds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from urllib.parse import urlsplit

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo, "smart_crawler_spark")):
    sys.path.insert(0, _repo)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--conf", required=True, metavar="MASTER_CONF")
    p.add_argument("--workdir", required=True)
    p.add_argument("--dirs", type=int, default=3)
    p.add_argument("--chain", type=int, default=2)
    p.add_argument("--details", type=int, default=100)
    p.add_argument("--budget", type=int, default=1)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from smart_crawler_spark.controller import SiteRuntime, run_settings
    from smart_crawler_spark.datagen.site import (
        SiteConfig,
        all_rows,
        generate_site_pages,
    )
    from smart_crawler_spark.session import spark_session
    from smart_crawler_spark.sources.config import load_settings_file

    settings = load_settings_file(args.conf)
    if not settings.seeds:
        raise SystemExit("no seeds configured under crawler.modeler")
    spark = spark_session(app_name="controller-job", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    runtimes = {}
    for seed in settings.seeds:
        host = urlsplit(seed.site).netloc or seed.site
        cfg = SiteConfig(
            n_hosts=1, dirs=args.dirs, chain=args.chain,
            details_per_page=args.details, n_images=10, hosts=[host],
        )
        runtimes[seed.site] = SiteRuntime(
            rows=all_rows(cfg),
            pages=generate_site_pages(spark, cfg).localCheckpoint(),
        )

    out = run_settings(
        spark, settings, runtimes, args.workdir,
        budget_per_host=args.budget,
    )
    for site, oc in out.items():
        row = {
            "site": site,
            "classes": len(oc.model.depths),
            "root": oc.model.root,
        }
        if oc.result is not None:
            row["fetched"] = oc.result.order.filter("fetched").count()
            row["rounds"] = oc.result.rounds
        print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
