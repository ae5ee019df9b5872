"""Build an engine-ready page corpus from raw HTML (Entry C on real
sites: hand-written target file + actual pages, ``README.md:33-36``).

The crawl engine's hermetic fetch is a join against a corpus whose rows
carry ``out_links`` keyed by the navigation xpaths and ``data_values``
keyed by the data xpaths. The synthetic datagen writes those keys
directly; for REAL HTML this module derives them:

- anchors are extracted once per page (M1, modeler/schema.py) keyed by
  their default xpath, then each key is EXPANDED with the two model
  dialects the reference emits — positional ``(xp)[i]`` (mutable menus,
  hand-written targets like ``targets/localhost_target.csv``) and
  href-predicated ``xp[@href="raw"]`` (fixed menus in saved models) —
  so the broadcast model join matches whichever form the target uses;
- ``data_values`` holds every model data-xpath evaluated against the
  page via the structural matcher (arbitrary selectors like
  ``//h1/text()`` supported).

The same rows feed the pure-Python oracle (crawler/oracle.py), so
engine-vs-oracle exact-match tests run on real reference fixture sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from smart_crawler_spark.modeler.schema import (
    extract_record,
    extract_schema,
    form_post_link,
)

CORPUS_SCHEMA = (
    "url string, host string, title string, true_class string,"
    " link_schema array<string>, out_links map<string, array<string>>,"
    " data_values map<string, string>, image_id string,"
    " caption_xpath string, redirect_to string, fetch_fail_n int"
)


def expand_link_keys(
    out_links: dict[str, list[str]], href_map: dict[str, str]
) -> dict[str, list[str]]:
    """Add ``(xp)[i]`` and ``xp[@href="raw"]`` aliases for every link,
    each in both predicate quote styles — hand-written targets use
    single quotes (``targets/localhost_target.csv``), saved models and
    this repo's extraction double quotes; a real XPath engine treats
    them identically, so the key join must too."""
    out = {k: list(v) for k, v in out_links.items()}
    for xp, hrefs in out_links.items():
        keys = [(xp, hrefs)]
        for i, h in enumerate(hrefs):
            keys.append((f"({xp})[{i + 1}]", [h]))
            keys.append((f'{xp}[@href="{href_map.get(h, h)}"]', [h]))
        for k, v in keys:
            out.setdefault(k, v)
            if '"' in k:
                out.setdefault(k.replace('"', "'"), v)
    return out


def corpus_rows_from_html(pages: list[dict], model) -> list[dict]:
    """``pages``: [{url, title, html}]; ``model``: NavigationModel.

    Returns engine/oracle corpus rows. ``data_values`` covers every
    data xpath any class declares (the engine then projects the ones of
    the fetched page's class, like the reference's per-class DataType
    dispatch)."""
    dls = sorted({(d["xpath"], d["dtype"]) for d in model.data_links})
    form_specs = sorted(
        {e["xpath"] for e in model.class_links if e["link_type"] == "form"}
    )
    rows = []
    for p in pages:
        s = extract_schema(p["url"], p["html"])
        vals = {}
        if dls:
            rec = extract_record(
                p["html"], [{"xpath": xp, "dtype": dt} for xp, dt in dls]
            )
            vals = {xp: v for (xp, _dt), v in zip(dls, rec) if v}
        host = p["url"].split("://", 1)[-1].split("/", 1)[0].lower()
        out_links = expand_link_keys(s["out_links"], s["href_map"])
        # form links (S3/E2): a matching form becomes one POST-encoded
        # out-link under the spec key, like CrawlPage.getOutLinks:158-166
        for spec in form_specs:
            href = form_post_link(p["url"], p["html"], spec)
            if href is not None:
                out_links[spec] = [href]
        rows.append(
            {
                "url": p["url"],
                "host": host,
                "title": p["title"],
                "true_class": "html",  # fetch_ok marker: page exists
                "link_schema": s["link_schema"],
                "out_links": out_links,
                "data_values": vals,
                "image_id": None,
                "caption_xpath": None,
                "redirect_to": p.get("redirect_to"),
                "fetch_fail_n": int(p.get("fetch_fail_n", 0)),
            }
        )
    return rows


def site_pages_from_html(
    spark: SparkSession, pages: list[dict], model
) -> DataFrame:
    """Spark corpus for CrawlEngine from raw HTML pages + a model."""
    return spark.createDataFrame(corpus_rows_from_html(pages, model),
                                 CORPUS_SCHEMA)
