"""Entry A — one HOCON master.conf, two fixture sites, one session
(``CrawlController.java:42-80``): site A is modeled dynamically
(``dynamic.pages > 0`` → DynamicModeler budget), site B loads a static
target file; both crawl under their per-seed settings and both match
the pure-Python oracle exactly."""

import pytest

from smart_crawler_spark.controller import SiteRuntime, run_settings
from smart_crawler_spark.crawler.oracle import crawl_all
from smart_crawler_spark.datagen.site import (
    SiteConfig,
    all_rows,
    generate_site_pages,
    target_tsv,
)
from smart_crawler_spark.sources.config import load_settings

CFG_A = SiteConfig(n_hosts=1, dirs=3, chain=2, details_per_page=3, n_images=10,
                   chain_first_dir_only=True, next_cycles=True)
CFG_B = SiteConfig(n_hosts=1, dirs=2, chain=1, details_per_page=4, n_images=10,
                   hosts=["siteb.test"])


def _conf(site_a: str, site_b: str, target_path: str) -> str:
    return "\n".join(
        [
            "crawler {",
            "  modeler {",
            f'    "{site_a}" {{',
            "      dynamic.pages = 40",
            "      crawl = true",
            "      wait = 0",
            "      randompause = 0",
            "    }",
            f'    "{site_b}" {{',
            f'      static.file = "{target_path}"',
            "      crawl = true",
            "      wait = 0",
            "      randompause = 0",
            "    }",
            "  }",
            "  crawling {",
            "    fetchers = 2",
            "    pages = 100000",
            "    frontierheap = 10000",
            "  }",
            "}",
        ]
    )


def _order(res_order_df):
    return [
        (r["seq"], r["url"], r["page_class"], r["fetched"])
        for r in res_order_df.orderBy("host", "seq").collect()
    ]


def _oracle_order(oracle_res):
    return [
        (o["seq"], o["url"], o["page_class"], o["fetched"])
        for o in oracle_res.order
    ]


@pytest.mark.parametrize("budget", [1])
def test_two_sites_one_config(spark, tmp_path, budget):
    site_a = f"http://{CFG_A.host(0)}"
    site_b = f"http://{CFG_B.host(0)}"
    target_path = tmp_path / "site_b_target.csv"
    target_path.write_text(target_tsv(CFG_B))

    settings = load_settings(_conf(site_a, site_b, str(target_path)))
    assert [s.site for s in settings.seeds] == [site_a, site_b]
    assert settings.seeds[0].model_pages == 40
    assert settings.seeds[1].file == str(target_path)

    runtimes = {
        site_a: SiteRuntime(
            rows=all_rows(CFG_A),
            pages=generate_site_pages(spark, CFG_A).localCheckpoint(),
        ),
        site_b: SiteRuntime(
            rows=all_rows(CFG_B),
            pages=generate_site_pages(spark, CFG_B).localCheckpoint(),
        ),
    }
    out = run_settings(
        spark, settings, runtimes, str(tmp_path / "run"),
        budget_per_host=budget,
    )

    for site, cfg in ((site_a, CFG_A), (site_b, CFG_B)):
        oc = out[site]
        assert oc.result is not None
        want = crawl_all(
            all_rows(cfg), oc.model, [site + "/"]
        )[cfg.host(0)]
        assert _order(oc.result.order) == _oracle_order(want), site
        # every site page is reachable under its model
        assert oc.result.order.filter("fetched").count() == len(all_rows(cfg))

    # the dynamic model came from the modeler (depths present, rooted),
    # the static one from the file (class names are the target's)
    assert out[site_a].model.depths[out[site_a].model.root] == 0
    assert "home" in out[site_b].model.depths
