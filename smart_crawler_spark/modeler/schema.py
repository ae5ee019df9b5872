"""Page-schema extraction from HTML (SURVEY M1/E1) — the vectorized UDF
that turns raw HTML into (link_schema, out_links, label_values).

Reference semantics (``modeler/model/Page.java:161-186``,
``util/XPathUtils.java:89-161``, ``util/HtmlUtils.java:160-176``):

- every anchor with an href gets a root-to-node default XPath (M2);
  the page's link schema is the set of those defaults; out-links are
  hrefs grouped per default XPath in document order;
- hrefs are resolved against the page URL and filtered: same
  registrable host only, no ``javascript:``/``mailto:``, no ``@``/``#``
  markers, no image targets;
- label schema: text nodes shorter than 60 chars whose element XPath
  matches exactly one node on the page; label value = the collapsed
  text.

Parsing uses the stdlib ``html.parser`` (no lxml in this sandbox) —
fine for the deterministic synthetic corpus; the Spark surface is
``extract_page_schemas`` (Arrow-batched ``mapInPandas``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit

import pandas as pd
from pyspark.sql import DataFrame

from smart_crawler_spark.modeler.xpath import XPath

MAX_LABEL_LEN = 60  # XPathUtils.java:153-161

SCHEMA = (
    "url string, link_schema array<string>, "
    "out_links map<string, array<string>>, "
    "label_values map<string, string>"
)


class _Node:
    __slots__ = ("tag", "attrs", "parent", "children", "texts")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children = []
        self.texts = []


_VOID = {"br", "img", "hr", "meta", "link", "input"}


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__()
        self.root = _Node("#document", [], None)
        self.cur = self.root
        self.anchors: list[_Node] = []
        self.text_nodes: list[tuple[_Node, str]] = []

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, [(k, v or "") for k, v in attrs], self.cur)
        self.cur.children.append(node)
        if tag == "a":
            self.anchors.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_endtag(self, tag):
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        text = re.sub(r"\s+", " ", data).strip()
        if text:
            self.text_nodes.append((self.cur, text))
            self.cur.texts.append(text)


def _chain(node: _Node) -> list[tuple[str, list[tuple[str, str]]]]:
    out = []
    n = node
    while n is not None and n.tag != "#document":
        out.append((n.tag, list(n.attrs)))
        n = n.parent
    return out


def is_valid_link(href: str, base_url: str) -> str | None:
    """Resolve + filter an href (HtmlUtils.java:160-176). Returns the
    absolute URL or None."""
    # '#' ANYWHERE rejects (fragment links are the same page) — the
    # reference tests link.contains("#"), not just a leading fragment
    if not href or "#" in href:
        return None
    low = href.lower()
    if low.startswith(("javascript:", "mailto:")) or "@" in href:
        return None
    if re.search(r"\.(jpe?g|png|gif|pdf)$", low):
        return None
    absu = urljoin(base_url, href)
    if urlsplit(absu).netloc.lower() != urlsplit(base_url).netloc.lower():
        return None
    return absu.rstrip("/") if urlsplit(absu).path not in ("", "/") else absu


def extract_schema(url: str, html: str) -> dict:
    """Pure-Python M1 kernel for one page."""
    tb = _TreeBuilder()
    tb.feed(html)
    out_links: dict[str, list[str]] = {}
    href_map: dict[str, str] = {}  # resolved URL -> raw href attribute
    for a in tb.anchors:
        href = dict(a.attrs).get("href")
        absu = is_valid_link(href, url)
        if absu is None:
            continue
        href_map.setdefault(absu, href)
        xp = XPath(_chain(a)).default
        out_links.setdefault(xp, [])
        if absu not in out_links[xp]:
            out_links[xp].append(absu)
    # label schema: short texts whose element xpath matches exactly 1 node
    by_xpath: dict[str, list[str]] = {}
    for node, text in tb.text_nodes:
        if len(text) >= MAX_LABEL_LEN or node.tag == "#document":
            continue
        xp = XPath(_chain(node)).default + "/text()"
        by_xpath.setdefault(xp, []).append(text)
    label_values = {
        xp: texts[0] for xp, texts in by_xpath.items() if len(texts) == 1
    }
    return {
        "url": url,
        "link_schema": sorted(out_links),
        "out_links": out_links,
        "label_values": label_values,
        "href_map": href_map,
    }


def _form_default_params(form: _Node) -> list[tuple[str, str]]:
    """The form's default submit parameters in document order — the
    subset of HtmlUnit's ``getParameterListForSubmit(null)`` semantics
    the fixtures need (``XPathUtils.getFormParameters:65-78``): named
    text-like inputs contribute their current value, checkboxes/radios
    only when checked, textareas their text, selects their selected (or
    first) option; submit/button/image/reset/file never contribute."""
    out: list[tuple[str, str]] = []
    for n in _all_nodes(form):
        attrs = dict(n.attrs)
        name = attrs.get("name")
        if not name:
            continue
        if n.tag == "input":
            itype = (attrs.get("type") or "text").lower()
            if itype in ("submit", "button", "image", "reset", "file"):
                continue
            if itype in ("checkbox", "radio"):
                if "checked" in attrs:
                    out.append((name, attrs.get("value", "on")))
                continue
            out.append((name, attrs.get("value", "")))
        elif n.tag == "textarea":
            out.append((name, " ".join(n.texts)))
        elif n.tag == "select":
            options = [c for c in _all_nodes(n) if c.tag == "option"]
            chosen = next(
                (o for o in options if "selected" in dict(o.attrs)), None
            ) or (options[0] if options else None)
            if chosen is not None:
                oattrs = dict(chosen.attrs)
                out.append((name, oattrs.get("value", " ".join(chosen.texts))))
    return out


def form_post_link(url: str, html: str, spec: str) -> str | None:
    """E2/S3: evaluate a form-link xpath spec against a page and encode
    the future POST as ``"url>name=value;name=value;..."``.

    The spec is the reference's form-link dialect
    (``targets/form_filling_target.csv``):
    ``formXPath,inputXPath:value,...`` — the form's default submit
    parameters come first, then one appended (name, value) per
    inputXPath:value pair (``XPathUtils.getFormParameters:65-78``). The
    POST goes to the CURRENT page's url, params joined with ';' and a
    trailing ';', exactly like ``CrawlPage.getOutLinks:158-166``.
    Returns None when no form on the page matches formXPath."""
    parts = spec.split(",")
    tb = _TreeBuilder()
    tb.feed(html)
    form = next(
        (
            n
            for n in _all_nodes(tb.root)
            if n.tag == "form" and xpath_struct_match(parts[0], _finest(n))
        ),
        None,
    )
    if form is None:
        return None
    params = _form_default_params(form)
    for extra in parts[1:]:
        xp, _, value = extra.rpartition(":")
        want = xp[2:] if xp.startswith("./") else xp
        node = next(
            (
                n
                for n in _all_nodes(form)
                if n is not form and xpath_struct_match(want, _finest(n))
            ),
            None,
        )
        if node is not None:
            name = dict(node.attrs).get("name")
            if name:
                params.append((name, value))
    return url + ">" + "".join(f"{n}={v};" for n, v in params)


def extract_page_schemas(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Arrow-batched M1 over a DataFrame of raw HTML pages."""

    cols = ["url", "link_schema", "out_links", "label_values"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    extract_schema(u, h)
                    for u, h in zip(pdf[url_col], pdf[html_col])
                ]
            )[cols]

    return pages.select(url_col, html_col).mapInPandas(gen, SCHEMA)


# --------------------------------------------------------------------------
# E4–E7: model-driven data-record extraction from HTML (the reference's
# DataType plugin surface — StringDataType/UrlDataType/ImgDataType,
# ``model/*DataType.java``, dispatched per PageClass data links)


def _all_nodes(root: _Node):
    stack = [root]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(reversed(n.children))


def xpath_struct_match(want: str, finest: str) -> bool:
    """Segment-wise suffix match of an xpath string against a node's
    finest root-to-node path (all tags, all attrs with values): the
    structural evaluation both the refine loop and arbitrary data
    xpaths (e.g. the reference's ``//h1/text()``,
    ``//img[@alt='logo']``) use in place of a real XPath engine.
    Attribute predicates accept single or double quotes."""
    want_parts = _split_path(want)
    have_parts = _split_path(finest)
    anchored = want.startswith("/") and not want.startswith("//")
    if anchored and len(want_parts) != len(have_parts):
        return False
    if len(want_parts) > len(have_parts):
        return False
    return all(
        _seg_match(wp, hp)
        for wp, hp in zip(reversed(want_parts), reversed(have_parts))
    )


def _split_path(p: str) -> list[str]:
    """Split an xpath on '/' OUTSIDE predicates — attribute values may
    themselves contain slashes (e.g. @src="/fake.jpg")."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in p:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "/" and depth == 0:
            if buf:
                parts.append("".join(buf))
                buf = []
            continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts


def _seg_match(want: str, have: str) -> bool:
    wname = want.split("[", 1)[0]
    hname = have.split("[", 1)[0]
    if wname != hname:
        return False
    have_attrs = dict(re.findall(r'@([\w:-]+)="([^"]*)"', have))
    for attr, dq, sq in re.findall(
        r"@([\w:-]+)(?:=(?:\"([^\"]*)\"|'([^']*)'))?", want
    ):
        if attr not in have_attrs:
            return False
        val = dq or sq
        if val and have_attrs[attr] != val:
            return False
    return True


def _finest(n: _Node) -> str:
    """Root-to-node path with every tag and attr=value (match target)."""
    parts = []
    cur = n
    while cur is not None and cur.tag != "#document":
        attrs = " and ".join(f'@{a}="{v}"' for a, v in cur.attrs)
        parts.append(f"{cur.tag}[{attrs}]" if attrs else cur.tag)
        cur = cur.parent
    return "/" + "/".join(reversed(parts))


def _index_page(html: str):
    tb = _TreeBuilder()
    tb.feed(html)
    by_xpath: dict[str, list[_Node]] = {}
    finest: list[tuple[str, _Node]] = []
    for n in _all_nodes(tb.root):
        if n.tag == "#document":
            continue
        by_xpath.setdefault(XPath(_chain(n)).default, []).append(n)
        finest.append((_finest(n), n))
    by_xpath["\x00finest"] = finest  # side-channel for the fallback
    return by_xpath


def _match(by_xpath: dict, xpath: str) -> list[_Node]:
    """Resolve a (possibly positional ``(xp)[i]`` or ``xp/text()``) data
    xpath against the page's default-xpath index; arbitrary user xpaths
    (hand-written target files: ``//h1/text()``, ``//img[@alt='logo']``)
    fall back to the structural matcher over each node's finest path —
    the DataType surface must accept any selector, not just the
    default-xpath dialect the modeler emits."""
    pos = None
    m = re.fullmatch(r"\((.*)\)\[(\d+)\]", xpath)
    if m:
        xpath, pos = m.group(1), int(m.group(2))
    xpath = xpath.removesuffix("/text()")
    nodes = by_xpath.get(xpath, [])
    if not nodes:
        nodes = [
            n
            for fs, n in by_xpath.get("\x00finest", [])
            if xpath_struct_match(xpath, fs)
        ]
    if pos is not None:
        nodes = nodes[pos - 1 : pos] if pos <= len(nodes) else []
    return nodes


def _collapse(s: str) -> str:
    # whitespace collapse + quote strip (XPathUtils.java:223-225,
    # StringDataType.java:15)
    return re.sub(r"\s+", " ", s).replace('"', "").strip()


def extract_data_value(by_xpath: dict, xpath: str, dtype: str) -> str:
    nodes = _match(by_xpath, xpath)
    if not nodes:
        return ""
    if dtype == "string":
        # multiple nodes join with a space (XPathUtils.java:194-225)
        return _collapse(" ".join(" ".join(n.texts) for n in nodes))
    if dtype == "url":
        # first anchor's raw href (UrlDataType.java:14-19)
        for n in nodes:
            href = dict(n.attrs).get("href")
            if href:
                return href
        return ""
    if dtype == "img":
        # src basename, quote-stripped (ImgDataType.java:14-21)
        src = dict(nodes[0].attrs).get("src", "")
        return _collapse(src.rsplit("/", 1)[-1].split(">")[0])
    raise ValueError(f"unknown dtype {dtype!r}")


def extract_record(html: str, data_links: list[dict]) -> list[str]:
    """Assemble one record in data-link order (PageClass.java:226-234)."""
    by_xpath = _index_page(html)
    return [
        extract_data_value(by_xpath, d["xpath"], d["dtype"]) for d in data_links
    ]
