"""Navigation-model loader — the reference's "query language" (SURVEY S9).

Parses the reference's target-TSV format (``ModelerService.java:101-158``;
examples ``targets/localhost_target.csv``):

    src  "link"  xpath  dst  subtype[  menu_href  menu_type]
    src  "form"  xpath
    src  <dtype> xpath [field_name]        # dtype ∈ string|url|img

subtype semantics: ``""`` untyped class link, ``menu``/``list``/``form``
typed, anything else = singleton whose anchor text is the subtype. The
root class is the src of the first row; depths are assigned by BFS from
the root over all links (``PageClass.setHierarchy``,
``model/PageClass.java:189-200``) — first-visit depth, which defines the
frontier priority (F2).

The model is tiny (dozens of classes), so parsing + BFS run driver-side;
the result is exposed as two broadcast-joinable DataFrames:
``class_links(src_class, xpath, dst_class, link_type, menu_href,
menu_type, dst_depth)`` and ``data_links(src_class, field_pos, xpath,
dtype, field_name)``.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class NavigationModel:
    root: str
    class_links: list[dict] = field(default_factory=list)
    data_links: list[dict] = field(default_factory=list)
    forms: list[dict] = field(default_factory=list)
    depths: dict[str, int] = field(default_factory=dict)

    def assign_depths(self) -> None:
        """BFS first-visit depth from root (C10)."""
        adj: dict[str, list[str]] = {}
        for e in self.class_links:
            adj.setdefault(e["src_class"], []).append(e["dst_class"])
        self.depths = {self.root: 0}
        q = deque([self.root])
        while q:
            c = q.popleft()
            for nxt in adj.get(c, []):
                if nxt not in self.depths:
                    self.depths[nxt] = self.depths[c] + 1
                    q.append(nxt)
        for e in self.class_links:
            e["dst_depth"] = self.depths.get(e["dst_class"])

    # -- Spark views ---------------------------------------------------
    def class_links_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [
                (
                    e["src_class"], i, e["xpath"], e["dst_class"], e["link_type"],
                    e.get("menu_href"), e.get("menu_type"), e.get("dst_depth"),
                )
                for i, e in enumerate(self.class_links)
            ],
            "src_class string, edge_pos int, xpath string, dst_class string,"
            " link_type string, menu_href string, menu_type string, dst_depth int",
        )

    def data_links_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [
                (d["src_class"], i, d["xpath"], d["dtype"], d["field_name"])
                for i, d in enumerate(self.data_links)
            ],
            "src_class string, field_pos int, xpath string, dtype string,"
            " field_name string",
        )

    def classes_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            sorted(self.depths.items()), "class_name string, class_depth int"
        )


def _menu_nav_xpath(href_col: str, menu_xpath: str) -> tuple[str, str | None]:
    """Reconstruct a menu row's navigation xpath the way the reference
    loads it (``PageClass.loadMenuLink:302-314`` + ``MenuItem.getXpath:
    108-117``): column 2 holds the item's href (fixed menus) or its
    positional ``(xp)[i]`` form (mutable menus, menu-xpath column
    empty). Digits → positional ``(key)[i]``; anything else with a menu
    xpath → href predicate ``key[@href="href"]`` — byte-equal to the
    reference's saved models (``StaticModelerTest.java:113-118``).
    A plain xpath with no menu column passes through unchanged (this
    repo's own earlier dialect)."""
    import re

    key, anchor = menu_xpath, href_col
    if not menu_xpath and href_col.startswith("("):
        j = href_col.rfind(")")
        key = href_col[1:j]
        anchor = re.sub(r"\[([0-9]+)\]", r"\1", href_col[j + 1 :])
    if anchor.isdigit():
        return f"({key})[{anchor}]", anchor
    if key:
        return f'{key}[@href="{anchor}"]', anchor
    return href_col, None


def parse_target_rows(rows: list[list[str]]) -> NavigationModel:
    model: NavigationModel | None = None
    for r in rows:
        r = list(r) + [""] * (7 - len(r))
        src, kind, xpath = r[0], r[1], r[2]
        if model is None:
            model = NavigationModel(root=src)
        if kind == "link":
            dst, subtype = r[3], r[4]
            if subtype in ("menu", "list", "form"):
                ltype = subtype
            elif subtype == "":
                ltype = ""
            else:
                ltype = "singleton"
            menu_href = r[5] or None
            if ltype == "menu":
                xpath, menu_href = _menu_nav_xpath(xpath, r[5])
            model.class_links.append(
                {
                    "src_class": src,
                    "xpath": xpath,
                    "dst_class": dst,
                    "link_type": ltype,
                    "anchor_text": subtype if ltype == "singleton" else None,
                    "menu_href": menu_href,
                    "menu_type": r[6] or None,
                }
            )
        elif kind == "form":
            model.forms.append({"src_class": src, "xpath": xpath})
        else:  # data row: (src, dtype, xpath[, field])
            model.data_links.append(
                {
                    "src_class": src,
                    "dtype": kind,
                    "xpath": xpath,
                    "field_name": r[3] or None,
                }
            )
    if model is None:
        raise ValueError("empty target model")
    model.assign_depths()
    return model


def load_target_tsv(text: str) -> NavigationModel:
    rows = [line.split("\t") for line in text.splitlines() if line.strip()]
    return parse_target_rows(rows)


def load_target_file(path: str) -> NavigationModel:
    with open(path) as f:
        return load_target_tsv(f.read())
