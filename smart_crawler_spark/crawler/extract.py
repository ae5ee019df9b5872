"""Fetch + extraction stages of one crawl round (SURVEY §2.3 / §3.2).

In the hermetic sandbox a "fetch" is a join of the round's batch against
the materialized ``site_pages`` corpus (the reference's HtmlUnit GET,
``util/HtmlUtils.java:43-66``, becomes an equi-join); retries are column
arithmetic (the reference re-fetches the same URL immediately up to
``max_tries`` before moving on — ``actors/CrawlFetcher.java:82-117`` —
so attempts never reorder the crawl); redirects adopt the target page's
content (``actors/CrawlPage.java:55,140-141``).

Extraction is model-driven: out-links are classified by a broadcast join
on (page_class, xpath) — ``actors/CrawlExtractor.java:97-117``,
``model/PageClass.java:212-218`` — and data records are assembled in
data-link field order — ``model/PageClass.java:226-234``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONTENT_COLS = ["out_links", "data_values", "image_id", "title", "true_class"]


def resolve_redirects(site_pages: DataFrame) -> DataFrame:
    """Pre-adopt redirect-target content into the corpus (one-time).

    Redirect adoption (``actors/CrawlPage.java:55,140-141``) is a static
    property of the corpus, not of a crawl round — resolving it once
    turns the per-round fetch into a single equi-join instead of two.
    The caller should materialize the result (engine does, at init).
    """
    tgt = site_pages.select(
        F.col("url").alias("redirect_to"),
        F.lit(True).alias("_t_found"),
        *[F.col(c).alias(f"_t_{c}") for c in _CONTENT_COLS],
    )
    resolved = site_pages.join(tgt, "redirect_to", "left")
    # adopt only when the target page actually loads: the reference keeps
    # whatever content the response carried when the redirect target is
    # unreachable (the oracle models this as falling back to the source
    # row, crawler/oracle.py pages.get(final, page)) — nulling the
    # content would flip fetch_ok for a page the reference counts fetched
    adopt = F.col("redirect_to").isNotNull() & F.col("_t_found").isNotNull()
    for c in _CONTENT_COLS:
        resolved = resolved.withColumn(
            c, F.when(adopt, F.col(f"_t_{c}")).otherwise(F.col(c))
        ).drop(f"_t_{c}")
    return resolved.drop("_t_found")


def fetch_batch_resolved(
    batch: DataFrame,
    resolved_pages: DataFrame,
    max_tries: int,
    form_sensitive: bool = False,
) -> DataFrame:
    """Join the batch with a redirect-resolved corpus: one equi-join.

    Returns the batch with content columns, ``final_url``, ``fetch_ok``
    and ``attempts`` (retries are column arithmetic — the reference
    re-fetches the same URL immediately up to ``max_tries``).

    ``form_sensitive``: the corpus carries POST-response rows keyed
    ``"url>params"`` (the reference POSTs the form params and the
    response has its own content/URL, ``CrawlPage.fetchUrl:135-141``) —
    form rows join on that key first and fall back to the plain url
    (a corpus without the POST row answers every param set with the GET
    page, the pre-round-3 behavior). GET-only corpora keep the single
    equi-join.
    """
    pages = resolved_pages.select(
        "url", "redirect_to", "fetch_fail_n", *_CONTENT_COLS
    )
    if not form_sensitive:
        fetched = batch.join(pages, "url", "left")
    else:
        pages_k = pages.withColumnRenamed("url", "_fk")
        fp = F.coalesce(F.col("form_params"), F.lit(""))
        b = batch.withColumn(
            "_fk",
            F.when(fp == "", F.col("url")).otherwise(
                F.concat(F.col("url"), F.lit(">"), F.col("form_params"))
            ),
        )
        j1 = b.join(pages_k, "_fk", "left")
        miss_form = F.col("true_class").isNull() & (
            F.col("_fk") != F.col("url")
        )
        hit1 = j1.filter(~miss_form).drop("_fk")
        retry = j1.filter(miss_form).select(*batch.columns)
        hit2 = retry.withColumn("_fk", F.col("url")).join(
            pages_k, "_fk", "left"
        ).drop("_fk")
        fetched = hit1.unionByName(hit2)
    return (
        fetched.withColumn(
            "fetch_ok",
            F.col("true_class").isNotNull()
            & (F.coalesce(F.col("fetch_fail_n"), F.lit(0)) < F.lit(max_tries)),
        )
        .withColumn(
            "attempts",
            F.least(
                F.coalesce(F.col("fetch_fail_n"), F.lit(0)) + 1, F.lit(max_tries)
            ),
        )
        .withColumn("final_url", F.coalesce(F.col("redirect_to"), F.col("url")))
    )


def fetch_batch(batch: DataFrame, site_pages: DataFrame, max_tries: int) -> DataFrame:
    """Join the batch with the page corpus; resolve retries + redirects.

    Convenience form for one-shot calls; iterative callers (the engine)
    resolve redirects once via ``resolve_redirects`` and use
    ``fetch_batch_resolved`` per round.
    """
    return fetch_batch_resolved(batch, resolve_redirects(site_pages), max_tries)


def extract_links(fetched_ok: DataFrame, class_links: DataFrame) -> DataFrame:
    """Explode out-links and pre-classify them via the navigation model.

    Output: one row per (source page, xpath, href) with the destination
    class/depth and a deterministic ``link_seq`` (xpath × position order)
    used to resolve intra-batch duplicate URLs the way the reference's
    sequential enqueue would.
    """
    exploded = fetched_ok.select(
        F.col("page_class").alias("src_class"),
        F.col("class_depth").alias("src_depth"),
        F.col("url").alias("src_url"),
        # the source's own form identity rides along so intra-batch
        # first-enqueuer ties between two form variants of one source
        # URL resolve in the reference's dequeue order (FRONTIER_ORDER
        # sorts form_params after url); standalone classification inputs
        # without the column are form-free
        (
            F.coalesce(F.col("form_params"), F.lit(""))
            if "form_params" in fetched_ok.columns
            else F.lit("")
        ).alias("src_fp"),
        "host",
        F.explode("out_links").alias("xpath", "hrefs"),
    ).select(
        "src_class", "src_depth", "src_url", "src_fp", "host", "xpath",
        F.posexplode("hrefs").alias("href_pos", "url"),
    )
    model = class_links.select(
        F.col("src_class"), F.col("xpath"), F.col("edge_pos"),
        F.col("dst_class").alias("page_class"),
        F.col("dst_depth").alias("class_depth"),
        *(
            [F.col("link_type").alias("_lt")]
            if "link_type" in class_links.columns
            else [F.lit("").alias("_lt")]
        ),
    )
    # fixed-menu model edges are href-predicated (xpath[@href="..."],
    # MenuItem.getXpath) — they classify by (menu base xpath, href
    # value), not by key equality with the page's out_links keys
    _HREF_RE = r'^(.*)\[@href="(.*)"\]$'
    is_href_menu = (F.col("_lt") == "menu") & F.col("xpath").rlike(
        r'\[@href=".*"\]$'
    )
    model_plain = model.filter(~is_href_menu).drop("_lt")
    href_rows = model.filter(is_href_menu)
    model_href = href_rows.select(
        F.col("src_class").alias("_m_src"),
        F.regexp_extract("xpath", _HREF_RE, 1).alias("_m_base"),
        F.regexp_extract("xpath", _HREF_RE, 2).alias("_m_href"),
        "edge_pos", "page_class", "class_depth",
    )
    # href-menu rows ALSO join by exact key: real-HTML corpora
    # (sources/htmlsite.py) alias each link under its predicated xpath
    # with the RAW href, which the resolved-URL comparison below cannot
    # see; when both paths match the same logical link, the intra-batch
    # dedup keeps the alias row (smaller link_seq)
    plain = exploded.join(
        F.broadcast(model_plain.unionByName(href_rows.drop("_lt"))),
        ["src_class", "xpath"],
        "inner",
    )
    # out_links may key menus positionally ((base)[i]) or by base xpath
    ebase = F.when(
        F.col("xpath").rlike(r"^\(.*\)\[\d+\]$"),
        F.regexp_extract("xpath", r"^\((.*)\)\[\d+\]$", 1),
    ).otherwise(F.col("xpath"))
    by_href = (
        exploded.withColumn("_ebase", ebase)
        .join(
            F.broadcast(model_href),
            (F.col("src_class") == F.col("_m_src"))
            & (F.col("_ebase") == F.col("_m_base"))
            & (F.col("url") == F.col("_m_href")),
            "inner",
        )
        .drop("_ebase", "_m_src", "_m_base", "_m_href")
    )
    classified = plain.unionByName(by_href)
    # form links encode a future POST as "url>k=v;k=v" (E2,
    # model/CrawlURL.java:46-56, factories/CrawlURLFactory.java:33-44)
    # split at the FIRST '>' like the oracle/reference (oracle.py
    # url.split('>', 1); CrawlURLFactory keeps everything after it as
    # the param blob) — substring_index(-1) would keep only the LAST
    # segment of a href whose param VALUES contain '>'
    form_params = F.when(
        F.col("url").contains(">"),
        F.expr("substring(url, instr(url, '>') + 1)"),
    ).otherwise(F.lit(None).cast("string"))
    plain_url = F.substring_index("url", ">", 1)
    # link_seq reproduces the reference's sequential enqueue order within
    # one source page: model-file edge order, then position in the node list
    from smart_crawler_spark.frontier.canonical import url_host

    # a link's host is its OWN authority (politeness, budgets, order
    # grouping, the host==url_host(url) frontier invariant) — the source
    # page's host only stands in for scheme-relative/odd hrefs that
    # don't parse to an authority
    own_host = url_host(plain_url)
    return classified.select(
        plain_url.alias("url"),
        F.coalesce(F.nullif(own_host, F.lit("")), F.col("host")).alias("host"),
        "page_class",
        F.col("class_depth"),
        F.col("page_class").alias("class_name"),
        form_params.alias("form_params"),
        "src_depth", "src_class", "src_url", "src_fp",
        (F.col("edge_pos").cast("long") * 1_000_000_000 + F.col("href_pos")).alias(
            "link_seq"
        ),
    )


def extract_records(fetched_ok: DataFrame, data_links: DataFrame) -> DataFrame:
    """Assemble data records: one row per page with fields in data-link
    order — ``(url, page_class, fields array<string>)``.

    Missing values become "" (the reference writes empty CSV cells).
    """
    dl = data_links.select("src_class", "field_pos", "xpath")
    # group on the DISPATCH identity (original url + form params), not
    # the final url: two same-round fetches can share a final url (both
    # sides of a redirect pair, or two form-param variants of one URL)
    # and the oracle emits one record per dispatch — grouping on final
    # url alone would concatenate their field lists into one bad record
    joined = fetched_ok.select(
        F.col("url").alias("_dispatch_url"),
        F.coalesce(F.col("form_params"), F.lit("")).alias("_dispatch_fp"),
        F.col("final_url").alias("url"),
        F.col("page_class"),
        "host",
        "data_values",
    ).join(
        F.broadcast(dl),
        F.col("page_class") == F.col("src_class"),
        "inner",
    )
    vals = joined.withColumn(
        "value",
        F.coalesce(F.element_at(F.col("data_values"), F.col("xpath")), F.lit("")),
    )
    return (
        vals.groupBy(
            "_dispatch_url", "_dispatch_fp", "url", "page_class", "host"
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("field_pos", "value"))),
                lambda s: s["value"],
            ).alias("fields")
        )
        .drop("_dispatch_url", "_dispatch_fp")
    )
