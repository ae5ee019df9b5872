"""Form-target end-to-end (S3/E2): a real-HTML site with a search form
is crawled under a reference-dialect form target
(``targets/form_filling_target.csv`` shape: ``src link
formXPath,./input:value dst form``). The extraction must emit the
POST-encoded ``url>name=value;...;`` out-link exactly like
``CrawlPage.getOutLinks:158-166`` (form default submit params + appended
overrides, ``XPathUtils.getFormParameters:65-78``), the frontier must
treat the params as part of the page identity
(``CrawlURLFactory.java:33-44``), and the POST response adopts its own
result URL (``CrawlPage.fetchUrl:135-141`` "URL will change") — all
asserted oracle-exact."""

from pyspark.sql import functions as F

from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
from smart_crawler_spark.crawler.oracle import crawl_all
from smart_crawler_spark.modeler.schema import form_post_link
from smart_crawler_spark.sources.htmlsite import (
    corpus_rows_from_html,
    site_pages_from_html,
)
from smart_crawler_spark.sources.targets import load_target_tsv

SITE = "http://formsite.test"
FORM_SPEC = '//form[@id="search-form"],./input[@id="q"]:tout'
POST_HREF = f"{SITE}/>lang=en;q=;q=tout;"

TARGET_TSV = "\n".join(
    [
        f"home\tlink\t{FORM_SPEC}\tresults\tform",
        "results\tlink\t/html/body/div[@class]/p/a\titem\tlist",
        "item\tstring\t//h1/text()\tname",
        # a class-level form row (form_actions_target.csv dialect:
        # login-before-extract, PageClass.setForm) must parse and ride
        # along — the hermetic corpus is the logged-in view
        'item\tform\t//form[@id="login"],./input[@name="user"]:u',
    ]
)

HOME_HTML = """<html><head><title>Home</title></head><body>
<form id="search-form" action="/search">
  <input type="hidden" name="lang" value="en"/>
  <input id="q" type="text" name="q" value=""/>
  <input type="submit" value="go"/>
</form>
</body></html>"""

RESULTS_HTML = """<html><head><title>Results</title></head><body>
<div class="res">
  <p><a href="/item-1">Item One</a></p>
  <p><a href="/item-2">Item Two</a></p>
</div>
</body></html>"""


def _item_html(name):
    return f"<html><head><title>{name}</title></head><body><h1>{name}</h1></body></html>"


def _pages():
    return [
        {"url": f"{SITE}/", "title": "Home", "html": HOME_HTML},
        # the POST response: keyed by "url>params", adopts the result
        # page's URL + content ("URL will change!")
        {
            "url": POST_HREF,
            "title": "",
            "html": "",
            "redirect_to": f"{SITE}/results/tout",
        },
        {"url": f"{SITE}/results/tout", "title": "Results", "html": RESULTS_HTML},
        {"url": f"{SITE}/item-1", "title": "Item One", "html": _item_html("Item One")},
        {"url": f"{SITE}/item-2", "title": "Item Two", "html": _item_html("Item Two")},
    ]


def test_form_post_link_encoding():
    """Default submit params (hidden + empty text input) in document
    order, then the override appended — trailing ';' included, exactly
    CrawlPage.getOutLinks' StringBuilder output."""
    assert form_post_link(SITE + "/", HOME_HTML, FORM_SPEC) == POST_HREF
    # no matching form on the page -> no link
    assert form_post_link(SITE + "/", RESULTS_HTML, FORM_SPEC) is None


def test_form_post_link_input_kinds():
    html = """<form id="f">
      <input type="checkbox" name="c1" value="x" checked/>
      <input type="checkbox" name="c2" value="y"/>
      <select name="s"><option value="a">A</option>
        <option value="b" selected>B</option></select>
      <textarea name="t">hello</textarea>
      <input type="submit" name="go" value="go"/>
    </form>"""
    got = form_post_link("http://h/", html, '//form[@id="f"]')
    assert got == "http://h/>c1=x;s=b;t=hello;"


def test_form_target_end_to_end(spark, tmp_path):
    model = load_target_tsv(TARGET_TSV)
    assert model.forms == [
        {
            "src_class": "item",
            "xpath": '//form[@id="login"],./input[@name="user"]:u',
        }
    ]
    rows = corpus_rows_from_html(_pages(), model)
    home = next(r for r in rows if r["url"] == f"{SITE}/")
    assert home["out_links"][FORM_SPEC] == [POST_HREF]

    pages_df = site_pages_from_html(spark, _pages(), model)
    eng = CrawlEngine(
        spark, pages_df, model, str(tmp_path), EngineConfig(budget_per_host=1)
    )
    res = eng.run([f"{SITE}/"])

    want = crawl_all(rows, model, [f"{SITE}/"])["formsite.test"]
    got_order = [
        (r["seq"], r["url"], r["page_class"], r["fetched"])
        for r in res.order.orderBy("seq").collect()
    ]
    assert got_order == [
        (o["seq"], o["url"], o["page_class"], o["fetched"]) for o in want.order
    ]
    # home, POST fetch (same plain url, distinct identity), 2 items
    assert [u for _s, u, _c, _f in got_order] == [
        f"{SITE}/", f"{SITE}/", f"{SITE}/item-1", f"{SITE}/item-2"
    ]
    assert all(f for _s, _u, _c, f in got_order)

    # seen set: exact match vs the oracle's canonical keys
    oracle_hashes = {
        r["h"]
        for r in spark.createDataFrame(
            [(k,) for k in sorted(want.seen)], "k string"
        ).select(F.xxhash64("k").alias("h")).collect()
    }
    assert {r["url_hash"] for r in res.seen.collect()} == oracle_hashes
    assert len(want.seen) == 5  # home, form identity, results, 2 items

    # records: extracted from the adopted result pages
    got_recs = {
        (r["url"], r["page_class"], tuple(r["fields"]))
        for r in res.records.collect()
    }
    assert got_recs == {
        (rec["url"], rec["page_class"], tuple(rec["fields"]))
        for rec in want.records
    }
    assert got_recs == {
        (f"{SITE}/item-1", "item", ("Item One",)),
        (f"{SITE}/item-2", "item", ("Item Two",)),
    }
