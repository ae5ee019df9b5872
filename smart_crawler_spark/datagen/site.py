"""Deterministic synthetic site graph (replaces live HTTP in the sandbox).

Models the reference fixture site (``/root/reference/testsite/minimal/
site/README:1-13``): home → menu{dir0..dirD-1, about}; dir → list{detail}
+ singleton NEXT chain; detail → menu{dir0, dir1} + data record (title,
caption, img, url). Schema per FIXTURES.md §2. Every page row is a pure
function of (host index, local page index) → generation is distributed
(``spark.range`` → ``mapInPandas``) and reproducible anywhere, including
inside the pure-Python oracle.

Skew: host 0 can get ``skew_factor×`` the detail count — the hot-host
case the salted repartition must handle.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from smart_crawler_spark.datagen.images import image_caption

SITE_PAGES_SCHEMA = (
    "url string, host string, true_class string, title string, "
    "link_schema array<string>, label_schema array<string>, "
    "out_links map<string, array<string>>, data_values map<string, string>, "
    "image_id string, caption_xpath string, redirect_to string, fetch_fail_n int"
)

# xpaths in the double-quoted form the XPath lattice renders
# (modeler/xpath.py; cf. DynamicModelerTest's '//ul[@id="menu"]/li/a')
MENU_XP = '//ul[@id="menu"]/li/a'
LIST_XP = '//div[@id="content"]/ul/li/a'
NEXT_XP = '//a[@id="page"]'
DETAIL_MENU_XP = '//div[@id="content"]/div[@class]/ul/li/a'
CAPTION_XP = '//p[@id="caption"]/text()'
TITLE_XP = '//h1[@id="title"]/text()'
IMG_XP = '//img[@id="photo"]'
ABOUT_XP = '//p[@id="about"]/text()'


@dataclass
class SiteConfig:
    n_hosts: int = 2
    dirs: int = 2              # D — dir classes per host (>= 2)
    chain: int = 2             # P — pages per dir NEXT-chain
    details_per_page: int = 3  # L — list links per dir page
    n_images: int = 100
    skew_factor: int = 1       # host 0 gets skew_factor * L details/page
    fail_every: int = 0        # every k-th detail needs 1 retry
    chain_first_dir_only: bool = False  # like testsite/minimal: only dir0
    # has a NEXT chain, other dirs are single pages (structural asymmetry
    # that makes the home menu's sampled destinations 3 distinct clusters)
    next_cycles: bool = False  # last chain page's NEXT points back to the
    # first (all chain pages share one schema -> NEXT is a self-loop edge
    # like the reference fixture's directory1)
    hosts: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        # detail pages hardcode menu links to /dir0 and /dir1 (and
        # target_rows emits a detail->dir1 edge): dirs < 2 would crawl
        # dead URLs silently instead of failing here
        if self.dirs < 2:
            raise ValueError("SiteConfig requires dirs >= 2")

    def host(self, k: int) -> str:
        return self.hosts[k] if self.hosts else f"site{k}.test"

    def details_l(self, k: int) -> int:
        return self.details_per_page * (self.skew_factor if k == 0 else 1)

    def chain_of(self, d: int) -> int:
        if self.chain_first_dir_only and d > 0:
            return 1
        return self.chain

    def dir_pages(self) -> int:
        return sum(self.chain_of(d) for d in range(self.dirs))

    def dir_offset(self, d: int) -> int:
        return sum(self.chain_of(i) for i in range(d))

    def pages_per_host(self, k: int) -> int:
        dp = self.dir_pages()
        return 1 + dp + dp * self.details_l(k) + 1

    def total_pages(self) -> int:
        return sum(self.pages_per_host(k) for k in range(self.n_hosts))


def _dir_url(base: str, d: int, p: int) -> str:
    return f"{base}/dir{d}" if p == 0 else f"{base}/dir{d}/page{p}"


def page_row(cfg: SiteConfig, k: int, local: int) -> dict:
    """Pure function (host, local page index) → site_pages row."""
    host = cfg.host(k)
    base = f"http://{host}"
    d_, l_ = cfg.dirs, cfg.details_l(k)
    dp = cfg.dir_pages()
    n_details = dp * l_
    row = {
        "host": host,
        "label_schema": [],
        "out_links": {},
        "data_values": {},
        "image_id": None,
        "caption_xpath": None,
        "redirect_to": None,
        "fetch_fail_n": 0,
    }
    if local == 0:  # home
        links = {f"({MENU_XP})[{i + 1}]": [f"{base}/dir{i}"] for i in range(d_)}
        links[f"({MENU_XP})[{d_ + 1}]"] = [f"{base}/about"]
        row.update(
            url=f"{base}/",
            true_class="home",
            title=f"Home {host}",
            link_schema=[MENU_XP],
            out_links=links,
        )
    elif local <= dp:  # dir pages
        i = local - 1
        d = max(dd for dd in range(d_) if cfg.dir_offset(dd) <= i)
        p = i - cfg.dir_offset(d)
        start = i * l_
        links = {LIST_XP: [f"{base}/detail/{n}" for n in range(start, start + l_)]}
        if cfg.next_cycles:
            has_next = cfg.chain_of(d) > 1
            nxt = (p + 1) % cfg.chain_of(d)
        else:
            has_next = p < cfg.chain_of(d) - 1
            nxt = p + 1
        if has_next:
            links[NEXT_XP] = [_dir_url(base, d, nxt)]
        row.update(
            url=_dir_url(base, d, p),
            true_class=f"dir{d}",
            title=f"Directory {d} page {p} {host}",
            link_schema=sorted({LIST_XP} | ({NEXT_XP} if has_next else set())),
            out_links=links,
        )
    elif local <= dp + n_details:  # detail pages
        n = local - 1 - dp
        gidx = (k * 1_000_003 + n) % cfg.n_images
        caption = image_caption(gidx)
        links = {
            f"({DETAIL_MENU_XP})[1]": [f"{base}/dir0"],
            f"({DETAIL_MENU_XP})[2]": [f"{base}/dir1"],
        }
        fail = (
            1 if cfg.fail_every and n % cfg.fail_every == cfg.fail_every - 1 else 0
        )
        row.update(
            url=f"{base}/detail/{n}",
            true_class="detail",
            title=f"Detail page {n}",
            link_schema=[DETAIL_MENU_XP],
            label_schema=[TITLE_XP, CAPTION_XP],
            out_links=links,
            data_values={
                TITLE_XP: f"Detail page {n}",
                CAPTION_XP: caption,
                IMG_XP: f"img{gidx}.png",
                f"({DETAIL_MENU_XP})[1]": f"{base}/dir0",
            },
            image_id=f"img{gidx}",
            caption_xpath=CAPTION_XP,
            fetch_fail_n=fail,
        )
    else:  # about
        row.update(
            url=f"{base}/about",
            true_class="about",
            title=f"About {host}",
            link_schema=[],
            label_schema=[ABOUT_XP],
            out_links={},
            data_values={ABOUT_XP: f"About {host}"},
        )
    return row


def all_rows(cfg: SiteConfig) -> list[dict]:
    """Driver-side full materialization (tests / the oracle)."""
    return [
        page_row(cfg, k, i)
        for k in range(cfg.n_hosts)
        for i in range(cfg.pages_per_host(k))
    ]


def generate_site_pages(
    spark: SparkSession, cfg: SiteConfig, partitions: int | None = None
) -> DataFrame:
    offsets = np.cumsum([0] + [cfg.pages_per_host(k) for k in range(cfg.n_hosts)])
    total = int(offsets[-1])
    parts = partitions or min(max(1, total // 512), 64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g in pdf["id"]:
                k = int(np.searchsorted(offsets, int(g), side="right") - 1)
                rows.append(page_row(cfg, k, int(g) - int(offsets[k])))
            yield pd.DataFrame(rows)

    return spark.range(0, total, numPartitions=parts).mapInPandas(
        gen, SITE_PAGES_SCHEMA
    )


# ----------------------------------------------------------------- html --
def page_html(row: dict) -> str:
    """Render a page row as HTML whose M1-extracted schema equals the
    row's declared ``link_schema``/``out_links``/``data_values`` (the
    pandas-UDF extractor in modeler/schema.py is tested against this)."""
    cls = row["true_class"]
    body = []
    if cls == "home":
        items = []
        n = len(row["out_links"])
        for i in range(1, n + 1):
            href = row["out_links"][f"({MENU_XP})[{i}]"][0]
            items.append(f'<li><a href="{href}">Item {i}</a></li>')
        body.append(f'<ul id="menu">{"".join(items)}</ul>')
    elif cls.startswith("dir"):
        lis = "".join(
            f'<li><a href="{h}">detail</a></li>'
            for h in row["out_links"].get(LIST_XP, [])
        )
        body.append(f'<div id="content"><ul>{lis}</ul></div>')
        for h in row["out_links"].get(NEXT_XP, []):
            body.append(f'<a id="page" href="{h}">NEXT</a>')
    elif cls == "detail":
        vals = row["data_values"]
        title = vals.get(TITLE_XP, "")
        caption = vals.get(CAPTION_XP, "")
        img = vals.get(IMG_XP, "")
        menu = "".join(
            f'<li><a href="{row["out_links"][f"({DETAIL_MENU_XP})[{i}]"][0]}">d</a></li>'
            for i in (1, 2)
            if f"({DETAIL_MENU_XP})[{i}]" in row["out_links"]
        )
        body.append(f'<h1 id="title">{title}</h1>')
        body.append(f'<p id="caption">{caption}</p>')
        body.append(f'<img id="photo" src="/static/{img}">')
        body.append(
            f'<div id="content"><div class="menu"><ul>{menu}</ul></div></div>'
        )
    elif cls == "about":
        body.append(f'<p id="about">{row["data_values"].get(ABOUT_XP, "")}</p>')
    return (
        f"<html><head><title>{row['title']}</title></head>"
        f"<body>{''.join(body)}</body></html>"
    )


# ---------------------------------------------------------------- model --
def target_rows(cfg: SiteConfig) -> list[list[str]]:
    """The hand-written navigation model as reference-format TSV rows
    (cf. ``targets/localhost_target.csv`` + ``ModelerService.java:101-158``):
    link rows (src, 'link', xpath, dst, subtype[, href, menutype]),
    data rows (src, dtype, xpath, field).
    """
    rows: list[list[str]] = []
    for i in range(cfg.dirs):
        rows.append(["home", "link", f"({MENU_XP})[{i + 1}]", f"dir{i}", "menu"])
    rows.append(["home", "link", f"({MENU_XP})[{cfg.dirs + 1}]", "about", "menu"])
    for i in range(cfg.dirs):
        rows.append([f"dir{i}", "link", LIST_XP, "detail", "list"])
        if cfg.chain_of(i) > 1:
            rows.append([f"dir{i}", "link", NEXT_XP, f"dir{i}", "NEXT"])
    rows.append(["detail", "link", f"({DETAIL_MENU_XP})[1]", "dir0", "menu"])
    rows.append(["detail", "link", f"({DETAIL_MENU_XP})[2]", "dir1", "menu"])
    rows.append(["detail", "string", TITLE_XP, "title"])
    rows.append(["detail", "string", CAPTION_XP, "caption"])
    rows.append(["detail", "img", IMG_XP, "photo"])
    rows.append(["detail", "url", f"({DETAIL_MENU_XP})[1]", "back"])
    rows.append(["about", "string", ABOUT_XP, "text"])
    return rows


def target_tsv(cfg: SiteConfig) -> str:
    return "\n".join("\t".join(r) for r in target_rows(cfg)) + "\n"


def golden_classes(cfg: SiteConfig) -> list[tuple[str, str]]:
    """(class, url regex) golden labels (cf. ``golden/localhost:8081.csv``)."""
    pats = [
        ("home", r"^http://[^/]+/$"),
        ("detail", r"^http://[^/]+/detail/\d+$"),
        ("about", r"^http://[^/]+/about$"),
    ]
    for i in range(cfg.dirs):
        pats.append((f"dir{i}", rf"^http://[^/]+/dir{i}(/page\d+)?$"))
    return pats
