"""URL canonicalization — native Catalyst expressions, no Python UDFs.

Reproduces the reference's dedup identity (what makes two URLs "the same
page"), re-expressed as column functions so the whole seen-filter stays
JVM-side:

- the dedup key is the *relative* URL: ``path [+ query] [+ '>'+form_params]``
  with the quirks of ``CrawlURL.getRelativeUrl`` (reference
  ``model/CrawlURL.java:86-99``):
    * fragment is always dropped (java.net.URI getPath/getQuery);
    * a root path (``/`` or empty with no query) collapses to ``""`` — so
      ``http://h/`` == ``http://h`` (``CrawlQueueTest.java:106-116``);
    * when the path is ``/`` the query is dropped too (the reference
      returns early before looking at the query);
    * path and query are concatenated WITHOUT the ``?`` separator.
- the reference SHA-1s the relative URL into a per-site visited set
  (``actors/frontier/CrawlQueue.java:81-87,206-217``); we key globally by
  ``xxhash64(host, relative)`` — 64-bit, JVM-side, and shardable by
  ``pmod(hash, P)`` for the partition-owned bloom filters (north_rule:
  canonicalized + hashed URLs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_host(url: Column | str) -> Column:
    """Authority of an absolute URL (politeness / partitioning / seen
    namespace key). The full netloc INCLUDING any port, like Python's
    urlsplit().netloc and the reference's per-website actors keyed by
    e.g. "localhost:8081" — parse_url's HOST drops the port, which
    would fuse two sites served on different ports of one host."""
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    )


def canonical_relative_url(
    url: Column | str, form_params: Column | None = None
) -> Column:
    """The reference's relative-URL dedup identity as one expression."""
    url = F.col(url) if isinstance(url, str) else url
    path = F.parse_url(url, F.lit("PATH"))
    query = F.parse_url(url, F.lit("QUERY"))
    fp = (
        F.lit("")
        if form_params is None
        else F.when(
            form_params.isNull() | (form_params == ""), F.lit("")
        ).otherwise(F.concat(F.lit(">"), form_params))
    )
    root_path = path.isNull() | (path == "/") | ((path == "") & query.isNull())
    return (
        F.when(root_path, fp)
        .when(query.isNull(), F.concat(path, fp))
        .otherwise(F.concat(path, query, fp))
    )


def url_seen_key(
    url: Column | str, form_params: Column | None = None
) -> Column:
    """64-bit seen-set key: xxhash64(host || '|' || relative_url).

    Collision note: at 10^10 URLs the 64-bit birthday bound gives ~0.3%
    chance of ANY collision across the whole crawl — acceptable for a
    seen-filter (a collision skips one page). Tests that require exactness
    also carry the string key.
    """
    url = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(
        F.concat_ws("|", url_host(url), canonical_relative_url(url, form_params))
    )


def host_suffixes(host: Column | str, max_labels: int = 6) -> Column:
    """All registrable-suffix candidates of a host, longest first:
    ``a.b.example.test`` -> [a.b.example.test, b.example.test,
    example.test, test]. Bounded at ``max_labels`` trailing labels, so
    the expression is O(1) per row regardless of hostname depth. Pure
    Catalyst (split/slice/transform) — map-side, codegen-friendly."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda i: F.concat_ws(".", F.slice(labels, n - i + 1, i)),
    )


def blocklist_filter(
    df,
    blocked: list[str],
    url_col: str = "url",
    keep_blocked_flag: bool = True,
    literal_max: int = 1000,
):
    """Domain blocklist with subdomain semantics: a blocked domain
    ``d`` blocks host == d and every ``*.d`` — the standard crawl
    deny-list rule (SafeSearch/adult/spam domain lists).

    Scale shape: the host explodes (expression-side, not row-side)
    into its <= 6 trailing-label suffixes. For a config-sized list the
    match is ``arrays_overlap`` against a literal array — zero joins,
    zero shuffle, whole-stage codegen over the corpus. For a list too
    big to inline (millions of domains), the suffixes explode into
    rows and semi-join the broadcast blocklist to yield the blocked-URL
    set; dropping is then a plain anti-join and flagging a left join —
    the corpus itself never shuffles on the broadcast leg, and the
    hit-set join side is left to AQE (broadcast while the blocked
    fraction is small, shuffle join if a list ever matches half the
    crawl). Both paths return the same rows; the flag column marks
    blocked rows instead of dropping them when ``keep_blocked_flag``
    (the audit-friendly shape)."""
    sufs = host_suffixes(url_host(F.col(url_col)))
    if len(blocked) <= literal_max:
        hit = F.arrays_overlap(
            sufs, F.array(*[F.lit(d) for d in sorted(set(blocked))])
        )
        flagged = df.withColumn("blocked", F.coalesce(hit, F.lit(False)))
        return (
            flagged
            if keep_blocked_flag
            else flagged.filter(~F.col("blocked")).drop("blocked")
        )
    spark = df.sparkSession
    blist = spark.createDataFrame(
        [(d,) for d in sorted(set(blocked))], "dom string"
    )
    hits = (
        df.select(url_col, F.explode(sufs).alias("dom"))
        .join(F.broadcast(blist), "dom")
        .select(F.col(url_col).alias("_burl"))
        .distinct()
    )
    if not keep_blocked_flag:
        return df.join(hits, df[url_col] == hits["_burl"], "left_anti")
    return (
        df.join(hits, df[url_col] == hits["_burl"], "left")
        .withColumn("blocked", F.col("_burl").isNotNull())
        .drop("_burl")
    )


def surt_key(url: Column | str) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) of an absolute
    URL — the key a CDX-style crawl index sorts by: scheme dropped,
    host labels reversed comma-wise, port reattached with ':', then
    ')' + path + ('?' + query), fragment discarded. All URLs of a
    registrable domain share a prefix ('test,example,'), so a
    10^10-row index range-scans any domain (and every subdomain) with
    one ordered-storage prefix scan instead of a full filter pass —
    the reason crawl indexes sort by SURT and the natural Iceberg/
    parquet sort key for the seen/order tables. Pure Catalyst
    expression, map-side."""
    u = F.col(url) if isinstance(url, str) else url
    auth = url_host(u)
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    host_only = F.regexp_replace(auth, r":\d+$", "")
    rev = F.array_join(F.reverse(F.split(host_only, r"\.")), ",")
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    query = F.parse_url(u, F.lit("QUERY"))
    return F.concat(
        rev,
        F.when(port == "", F.lit("")).otherwise(
            F.concat(F.lit(":"), port)
        ),
        F.lit(")"),
        path,
        F.when(query.isNull(), F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )


def idn_normalize_host(df, host_col: str = "host", out_col: str = "host_idn"):
    """IDN → punycode host normalization (RFC 3490 ToASCII): the
    frontier identity for internationalized domains — 'MÜNCHEN.example'
    and 'xn--mnchen-3ya.example' are the SAME host on the wire, so seen
    keys and politeness budgets must agree on one form.

    Scale design: the overwhelmingly-common pure-ASCII host takes the
    native `lower()` fast path inside codegen; only rows whose host
    contains a non-ASCII byte reach the Arrow-batched pandas UDF
    (encodings.idna per label, stdlib — no external package). A host
    that fails ToASCII (empty/overlong label) keeps its lowercased
    original rather than poisoning the row.

    Adds ``out_col`` to ``df``; every other column rides through."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _to_ascii(h):
        if h is None:
            return None
        try:
            return h.encode("idna").decode("ascii").lower()
        except UnicodeError:
            return h.lower()

    puny = F.pandas_udf(
        lambda s: s.map(_to_ascii), "string"
    )
    is_ascii = F.col(host_col).rlike(r"^[\x00-\x7F]*$")
    return df.withColumn(
        out_col,
        F.when(is_ascii, F.lower(F.col(host_col))).otherwise(
            puny(F.col(host_col))
        ),
    )
