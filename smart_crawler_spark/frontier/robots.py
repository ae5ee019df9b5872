"""robots.txt enforcement (north_rule: "politeness budgets + robots").

The reference crawler has no robots handling (nothing in
``actors/CrawlFetcher.java`` or ``util/HtmlUtils.java`` consults
robots.txt) — this module is the Spark-native addition the target
deployment needs: Robots Exclusion Protocol (RFC 9309) group selection,
longest-match allow/disallow with ``*``/``$`` wildcards, and per-host
Crawl-delay feeding the politeness budget (F4).

Scale design: robots rules are a per-host *dimension* (tens of rules per
host), so the filter is NOT a join — rules are compiled once and shipped
to executors in the UDF closure (Spark broadcasts it with the task), and
each Arrow batch is decided with pandas' C-level vectorized regex
matching per rule: no shuffle, no per-row Python, cost O(rows ×
rules_of_host) like the join form but with zero data movement.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIELD_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")


@dataclass(frozen=True)
class RobotsRule:
    allow: bool
    pattern: str  # raw REP pattern, e.g. "/detail/*" or "/dir1$"

    @property
    def specificity(self) -> int:
        return len(self.pattern)

    def regex(self) -> str:
        """Translate the REP pattern to an anchored-at-start regex:
        ``*`` → ``.*``, trailing ``$`` → end anchor, rest escaped."""
        pat = self.pattern
        anchored = pat.endswith("$")
        if anchored:
            pat = pat[:-1]
        parts = [re.escape(p) for p in pat.split("*")]
        return ".*".join(parts) + (r"\Z" if anchored else "")


@dataclass
class HostRobots:
    rules: list[RobotsRule] = field(default_factory=list)
    crawl_delay_s: float | None = None
    # Sitemap: lines are group-INDEPENDENT (RFC 9309 / sitemaps.org —
    # they apply to every agent, wherever they appear in the file)
    sitemaps: list[str] = field(default_factory=list)


def parse_robots(text: str, agent: str = "*") -> HostRobots:
    """Parse one robots.txt for ``agent``: RFC 9309 group selection —
    the user-agent token that is the longest *prefix* of our agent
    product token wins, and the rules of ALL groups matching at that
    specificity are merged (§2.2.1: multiple groups for the same agent
    combine); ``*`` is the least-specific fallback. Empty Disallow = no
    rule. Crawl-delay across merged groups takes the max (conservative).
    """
    groups: list[tuple[list[str], HostRobots]] = []
    cur: tuple[list[str], HostRobots] | None = None
    sitemaps: list[str] = []
    in_ua_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0]
        m = _FIELD_RE.match(line)
        if not m:
            continue
        key, val = m.group(1).lower(), m.group(2)
        if key == "sitemap":
            if val:
                sitemaps.append(val)  # URL: case preserved
            continue
        if key == "user-agent":
            if not in_ua_run:
                cur = ([], HostRobots())
                groups.append(cur)
            cur[0].append(val.lower())
            in_ua_run = True
            continue
        in_ua_run = False
        if cur is None:
            continue  # rules before any user-agent line: ignored
        if key in ("allow", "disallow"):
            if val == "" and key == "disallow":
                continue  # "Disallow:" = allow everything, no rule
            if val:
                cur[1].rules.append(RobotsRule(key == "allow", val))
        elif key == "crawl-delay":
            try:
                cur[1].crawl_delay_s = float(val)
            except ValueError:
                pass

    agent_l = agent.lower()

    def _spec(ua: str) -> int:
        """-1 = no match; 0 = wildcard; else prefix-match length."""
        if ua == "*":
            return 0
        return len(ua) if agent_l.startswith(ua) else -1

    best_spec = max(
        (_spec(ua) for uas, _ in groups for ua in uas), default=-1
    )
    if best_spec < 0:
        return HostRobots(sitemaps=sitemaps)
    merged = HostRobots(sitemaps=sitemaps)
    for uas, hr in groups:
        if not any(_spec(ua) == best_spec for ua in uas):
            continue
        merged.rules.extend(hr.rules)
        if hr.crawl_delay_s is not None:
            merged.crawl_delay_s = (
                hr.crawl_delay_s
                if merged.crawl_delay_s is None
                else max(merged.crawl_delay_s, hr.crawl_delay_s)
            )
    return merged


def decide(rules: list[RobotsRule], path: str) -> bool:
    """Longest-match decision for one path (pure-Python twin of the
    vectorized filter — used by the crawl oracle and tests)."""
    best_len, best_allow = -1, True
    for r in rules:
        if re.match(r.regex(), path):
            if r.specificity > best_len or (
                r.specificity == best_len and r.allow and not best_allow
            ):
                best_allow = r.allow
            best_len = max(best_len, r.specificity)
    return best_allow


class RobotsPolicy:
    """Per-host parsed robots: the broadcastable dimension object."""

    def __init__(self, robots_texts: dict[str, str], agent: str = "*"):
        self.agent = agent
        self.by_host: dict[str, HostRobots] = {
            host: parse_robots(text, agent) for host, text in robots_texts.items()
        }

    def sitemap_seeds(self, spark) -> DataFrame:
        """(host, sitemap_url) rows advertised across all hosts' robots
        files — the bootstrap input for sources/sitemap.py: the fetch
        tier pulls each URL and parse_sitemaps explodes the documents
        (index rows loop back as further fetches)."""
        rows = [
            (h, u)
            for h, hr in self.by_host.items()
            for u in hr.sitemaps
        ]
        return spark.createDataFrame(
            rows, "host string, sitemap_url string"
        )

    def crawl_delays_ms(self) -> dict[str, int]:
        return {
            h: int(hr.crawl_delay_s * 1000)
            for h, hr in self.by_host.items()
            if hr.crawl_delay_s
        }

    def rules_df(self, spark) -> DataFrame:
        """Relational form of the rules (for plan-level composition and
        the driver's oracle checks)."""
        rows = [
            (h, r.allow, r.pattern, r.specificity, r.regex())
            for h, hr in self.by_host.items()
            for r in hr.rules
        ]
        return spark.createDataFrame(
            rows,
            "host string, allow boolean, pattern string, pattern_len int,"
            " regex string",
        )


def url_path_query(url_col) -> "F.Column":
    """path+query of a URL (the REP match target); '' → '/'.

    The authority stops at ``/``, ``?`` or ``#`` — ``[^/]*`` alone would
    swallow the query of a path-less URL like ``http://h?q=1``, making
    its rules match against ``/`` instead of ``/?q=1``."""
    stripped = F.regexp_replace(
        url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""
    )
    no_frag = F.regexp_replace(stripped, r"#.*$", "")
    return F.when(no_frag == "", F.lit("/")).when(
        no_frag.startswith("?"), F.concat(F.lit("/"), no_frag)
    ).otherwise(no_frag)


def filter_allowed(
    candidates: DataFrame,
    policy: RobotsPolicy,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop candidates a host's robots.txt disallows.

    mapInPandas with the compiled per-host matchers in the closure:
    per Arrow batch, each rule is evaluated with pandas' vectorized
    ``str.match`` over the host's rows only; decision = longest match,
    allow wins ties, default allow. Hosts without robots pass through
    untouched. No shuffle."""
    host_rules = {
        h: [(r.allow, r.specificity, r.regex()) for r in hr.rules]
        for h, hr in policy.by_host.items()
        if hr.rules
    }
    if not host_rules:
        return candidates
    schema = candidates.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        compiled = {
            h: [(a, n, re.compile(rx)) for a, n, rx in rs]
            for h, rs in host_rules.items()
        }
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            keep = np.ones(len(pdf), dtype=bool)
            paths = (
                pdf[url_col]
                .str.replace(
                    r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "", regex=True
                )
                .str.replace(r"#.*$", "", regex=True)
                .replace("", "/")
            )
            # path-less URLs with a query: REP matches against /?q=...
            q = paths.str.startswith("?")
            if q.any():
                paths = paths.mask(q, "/" + paths)
            pos = np.arange(len(pdf))
            for h, grp_idx in pdf.groupby(pdf[host_col].to_numpy()).groups.items():
                rules = compiled.get(h)
                if not rules:
                    continue
                sel = pos[pdf.index.get_indexer(grp_idx)]
                gp = paths.iloc[sel]
                best_len = np.full(len(sel), -1, dtype=np.int64)
                best_allow = np.ones(len(sel), dtype=bool)
                for allow, plen, rx in rules:
                    m = gp.str.match(rx).to_numpy(dtype=bool)
                    upd = m & (
                        (plen > best_len)
                        | ((plen == best_len) & (allow & ~best_allow))
                    )
                    best_allow = np.where(upd, allow, best_allow)
                    best_len = np.where(m, np.maximum(best_len, plen), best_len)
                keep[sel] = best_allow
            yield pdf[keep]

    return candidates.mapInPandas(gen, schema)
