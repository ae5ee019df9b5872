"""Crawler-trap detection and URL template mining — frontier hygiene.

The reference crawls closed synthetic sites and never meets traps; on
the open web a frontier at 10^10 URLs is mostly machine-generated link
space (calendars, session ids, faceted search, path cycles), so the
scheduler needs a cheap per-URL trap verdict BEFORE a URL costs a
fetch, and per-template counts to budget pattern families instead of
individual URLs.

Both operators are pure Catalyst expressions over the URL string:
``trap_features`` is map-only (zero shuffle — it composes with the F1
seen filter and F2 priority queue without adding an Exchange), and
``url_templates`` adds exactly one hash aggregation on the template
key. No Python runs per row, so a 10^10-row frontier pays only the
scan + codegen cost; every rule is replayable in ANSI SQL, which is
how the driver gate oracles them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query keys that mint a fresh URL per visitor: any URL carrying one is
# an unbounded alias family for the same page
SESSION_PARAM_RE = r"(^|&)(phpsessid|jsessionid|sessionid|sid)="

# a calendar trap walks year/month links far outside the plausible
# content window; flag path years outside [1990, 2039]
CALENDAR_YEAR_RE = r"/((1[0-8][0-9]{2})|(19[0-8][0-9])|(20[4-9][0-9])|(2[1-9][0-9]{2}))(/|$)"

MAX_DEPTH = 8  # organic information architecture rarely exceeds this
REPEAT_DEPTH = 6  # depth at which repeated segments mean a path cycle
MAX_PARAMS = 6  # faceted-search explosion threshold


def _url_path(url: Column) -> Column:
    """Path component: strip scheme://host, then ?query / #fragment."""
    return F.regexp_replace(
        F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
        r"[?#].*$",
        "",
    )


def _url_query(url: Column) -> Column:
    """Query string without the leading '?' ('' when absent). The '?'
    must precede any '#': a '?' inside the fragment is not a query
    (urllib.parse semantics, fuzz-pinned in test_traps.py)."""
    return F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)


def _features(url: Column) -> dict[str, Column]:
    """The shared feature expressions (all map-only Catalyst)."""
    path = _url_path(url)
    query = _url_query(url)
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    depth = F.size(segs)
    repeat_frac = F.when(
        depth > 0,
        F.round(1.0 - F.size(F.array_distinct(segs)) / depth, 6),
    ).otherwise(F.lit(0.0))
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    return {
        "depth": depth,
        "repeat_frac": repeat_frac,
        "n_params": n_params,
        "has_session": F.lower(query).rlike(SESSION_PARAM_RE),
        "calendar_trap": path.rlike(CALENDAR_YEAR_RE),
    }


def trap_expr(url: Column | str) -> Column:
    """The composite is_trap predicate as a single Column — usable as a
    plain ``.filter(~trap_expr("url"))`` in the engine's link path
    without touching the frame's columns (still zero shuffle)."""
    url = F.col(url) if isinstance(url, str) else url
    f = _features(url)
    return (
        f["has_session"]
        | f["calendar_trap"]
        | (f["depth"] >= MAX_DEPTH)
        | ((f["depth"] >= REPEAT_DEPTH) & (f["repeat_frac"] >= 0.5))
        | (f["n_params"] >= MAX_PARAMS)
    )


def trap_features(
    df: DataFrame, url_col: str = "url", keep_cols: list[str] | None = None
) -> DataFrame:
    """Per-URL trap features + verdict, map-only.

    Features: ``depth`` (path segments), ``repeat_frac`` (1 −
    distinct/total segments — a /a/b/a/b/a/b cycle scores 0.66),
    ``n_params``, ``has_session`` (session-id query key), and
    ``calendar_trap`` (path year outside [1990, 2039]). ``is_trap``
    fires on any of: session id; calendar year; depth ≥ 8; depth ≥ 6
    with ≥ half the segments repeated; ≥ 6 query params. Thresholds
    are module constants so deployments can tune them; the driver
    gate replays these exact values in SQL."""
    url = F.col(url_col)
    f = _features(url)
    cols = list(keep_cols) if keep_cols else [url_col]
    return df.select(
        *cols,
        f["depth"].alias("depth"),
        f["repeat_frac"].alias("repeat_frac"),
        f["n_params"].alias("n_params"),
        f["has_session"].alias("has_session"),
        f["calendar_trap"].alias("calendar_trap"),
        trap_expr(url).alias("is_trap"),
    )


def template_cap(
    df: DataFrame,
    k: int,
    url_col: str = "url",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Enforce a per-template crawl budget: at most ``k`` URLs survive
    per template family, picked by ``order_cols`` ascending (frontier
    priority; default the URL itself). The order must be a TOTAL order
    for a deterministic pick — when the URL can repeat (one page
    enqueued from several parents), append a unique id. The complement
    of ``url_templates``: mining finds the generated link spaces, this
    caps them without a separate join against the mined table.

    Scale shape: the rank<=k filter plans as WindowGroupLimit
    (Spark 4) — a Partial limit runs map-side before the shuffle, so
    each map task ships at most ~k rows per template; the shuffle is
    bounded by k × n_templates, not the frontier size. Keeps every
    input column and adds ``template``."""
    from pyspark.sql import Window

    order = [F.col(c).asc() for c in (order_cols or [url_col])]
    out = df.withColumn("template", template_expr(F.col(url_col)))
    w = Window.partitionBy("template").orderBy(*order)
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def host_profile(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host hygiene rollup — the table an operator (or an adaptive
    scheduler) reads to decide which hosts deserve budget: URL count,
    trap count/rate, and distinct template families (a host whose URL
    count dwarfs its template count is serving a generated link space).
    One hash agg on host; countDistinct(template) is the only expanded
    aggregate and templates per host are bounded by site structure, not
    URL count."""
    url = F.col(url_col)
    from smart_crawler_spark.frontier.canonical import url_host

    keyed = df.select(
        url_host(url).alias("host"),
        template_expr(url).alias("template"),
        trap_expr(url).cast("int").alias("is_trap"),
    )
    return keyed.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("is_trap").alias("n_traps"),
        F.round(F.sum("is_trap") / F.count(F.lit(1)), 6).alias("trap_rate"),
        F.countDistinct("template").alias("n_templates"),
    )


def mirror_families(
    df: DataFrame, url_col: str = "url", content_col: str = "text"
) -> DataFrame:
    """Detect mirrored content: identical payloads served from ≥ 2
    hosts. One hash agg on md5(content) — count/min carry map-side
    partials and the host set per content key is bounded by the mirror
    fan-out, so the shuffle moves one compact row per (task, content
    key). Output per family: the content key, ``n_hosts`` / ``n_urls``,
    the lexicographically-first member as ``canonical_url``, and the
    sorted host list as a comma-joined string (string, not array, so
    any SQL engine reproduces the value byte-for-byte). A frontier
    joins this to demote known-mirror hosts before spending fetch
    budget re-crawling the same bytes."""
    from smart_crawler_spark.frontier.canonical import url_host

    url = F.col(url_col)
    keyed = df.select(
        url.alias("url"),
        url_host(url).alias("host"),
        F.md5(F.col(content_col).cast("binary")).alias("content_key"),
    )
    return (
        keyed.groupBy("content_key")
        .agg(
            F.countDistinct("host").alias("n_hosts"),
            F.count(F.lit(1)).alias("n_urls"),
            F.min("url").alias("canonical_url"),
            F.concat_ws(",", F.sort_array(F.collect_set("host"))).alias(
                "hosts"
            ),
        )
        .filter(F.col("n_hosts") >= 2)
    )


def template_expr(url: Column | str) -> Column:
    """The template key: host + path with every digit run collapsed to
    ``{d}`` — one family per generated-URL pattern."""
    from smart_crawler_spark.frontier.canonical import url_host

    url = F.col(url) if isinstance(url, str) else url
    return F.concat(
        url_host(url),
        F.regexp_replace(_url_path(url), r"[0-9]+", "{d}"),
    )


def url_templates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Mine URL pattern families: host + path with every digit run
    collapsed to ``{d}`` is the template key; per template report
    ``n_urls``, ``n_hosts``, and the lexicographically smallest member
    as ``sample_url``. One hash agg on the template — min/count carry
    map-side partials, so the shuffle moves one row per (task,
    template), not per URL. A template whose n_urls dwarfs its
    siblings is a generated link space: budget it as a family (crawl
    k members), not URL-by-URL."""
    from smart_crawler_spark.frontier.canonical import url_host

    url = F.col(url_col)
    template = template_expr(url)
    return (
        df.select(
            url.alias("url"),
            template.alias("template"),
            url_host(url).alias("host"),
        )
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
            F.min("url").alias("sample_url"),
        )
    )
