"""Cluster graph → navigation model (SURVEY §2.5 C9–C11, batch form).

The reference replays per-page PageLinks into typed ClassLinks with a
precedence (list overrides singleton/menu; menu overrides singleton —
``ListPageLink.java:14-27``, ``MenuPageLink.java:21-31``,
``SinglePageLink.java:19-25``), names classes from member page titles
(``ModelPageClass.name():113-118``), and assigns BFS depths from the
root (``PageClass.java:189-200``).

Batch typing decision per (src_cluster, xpath): the reference's C5
decision table runs during sequential sampling; here we decide from the
aggregate shape of the already-fetched corpus:

- >1 href per source page (on average)          → list
- 1 href/page AND one shared destination set
  across >=2 source pages                        → menu (fixed)
- otherwise                                      → singleton

Menus whose per-page href lists are pairwise disjoint would be mutable
(``MenuItem.isMutable():80-84``); with one href per xpath key this
reduces to: same xpath, different hrefs on different pages → mutable.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_crawler_spark.sources.targets import NavigationModel


def page_links(assigned: DataFrame) -> DataFrame:
    """Per-page out-edges joined to destination clusters.

    ``assigned``: pages with ``cluster_id`` (from cluster_pages).
    Output: (src_cluster, xpath, src_url, pos, dst_url, dst_cluster,
    n_hrefs).
    """
    edges = assigned.select(
        F.col("cluster_id").alias("src_cluster"),
        F.col("url").alias("src_url"),
        F.explode(F.coalesce("out_links", F.create_map())).alias("xpath", "hrefs"),
    ).select(
        "src_cluster",
        "src_url",
        "xpath",
        F.size("hrefs").alias("n_hrefs"),
        F.posexplode("hrefs").alias("pos", "dst_url"),
    )
    dst = assigned.select(
        F.col("url").alias("dst_url"), F.col("cluster_id").alias("dst_cluster")
    )
    return edges.join(dst, "dst_url", "inner")


def class_links_from_pages(assigned: DataFrame) -> DataFrame:
    """Aggregate page links into typed class links (C9 + C11).

    Typing per (src_cluster, xpath):
    - the xpath fans out to MULTIPLE destination clusters → a **menu**,
      typed by the reference's Menu/MenuItem semantics (``Menu.java:
      51-59``, ``MenuItem.java:80-117``): an item (destination cluster)
      is *mutable* iff two source pages' href lists for it are disjoint;
      any mutable item makes the whole menu mutable → positional
      ``(xpath)[i]`` edges; otherwise fixed → one href-predicated
      ``xpath[@href=...]`` edge per distinct href;
    - single destination cluster, >1 href per page → **list**;
    - otherwise → **singleton** (e.g. NEXT self-links).

    Contract: fixed-menu ``@href`` predicates are emitted in the SAME
    value space as the hrefs in ``assigned.out_links`` — this batch
    builder is fed structured corpora whose hrefs are already absolute
    (raw == resolved). A real-HTML flow must either pass RAW href
    attributes in ``out_links`` or alias-expand its corpus link keys
    like ``sources/htmlsite.py`` does; the dynamic modeler
    (``dynamic.py`` via ``href_map``) emits raw-href predicates, the
    reference's MenuItem.hrefXPath dialect.
    """
    from pyspark.sql import Window

    pl = page_links(assigned)
    per_xpath = pl.groupBy("src_cluster", "xpath").agg(
        F.countDistinct("dst_cluster").alias("n_dst_clusters"),
        F.avg("n_hrefs").alias("avg_hrefs"),
        F.countDistinct("src_url").alias("n_src_pages"),
    )
    pl2 = pl.join(per_xpath, ["src_cluster", "xpath"])

    menu_pl = pl2.filter(F.col("n_dst_clusters") > 1)
    # MenuItem.isMutable distributed: per item (= dst cluster), compare
    # the two lexicographically-first source pages' href sets
    item_pages = menu_pl.groupBy(
        "src_cluster", "xpath", "dst_cluster", "src_url"
    ).agg(F.collect_set("dst_url").alias("hrefs"))
    w2 = Window.partitionBy("src_cluster", "xpath", "dst_cluster").orderBy(
        "src_url"
    )
    first2 = item_pages.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= 2
    )
    menu_mut = (
        first2.groupBy("src_cluster", "xpath", "dst_cluster")
        .agg(
            F.min_by("hrefs", "_rn").alias("h1"),
            F.max_by("hrefs", "_rn").alias("h2"),
            F.count(F.lit(1)).alias("np"),
        )
        .select(
            "src_cluster",
            "xpath",
            (
                (F.col("np") >= 2)
                & (F.size(F.array_intersect("h1", "h2")) == 0)
            ).alias("im"),
        )
        .groupBy("src_cluster", "xpath")
        .agg(F.max("im").alias("is_mutable"))
    )
    pl3 = menu_pl.join(menu_mut, ["src_cluster", "xpath"])
    menus_mutable = (
        pl3.filter(F.col("is_mutable"))
        .groupBy("src_cluster", "xpath", "pos")
        .agg(
            F.mode("dst_cluster").alias("dst_cluster"),
            F.count(F.lit(1)).alias("n_edges"),
        )
        .select(
            "src_cluster",
            F.concat(
                F.lit("("), "xpath", F.lit(")["),
                (F.col("pos") + 1).cast("string"), F.lit("]"),
            ).alias("xpath"),
            "dst_cluster",
            F.lit("menu").alias("link_type"),
            F.lit("mutable").alias("menu_type"),
            "n_edges",
        )
    )
    menus_fixed = (
        pl3.filter(~F.col("is_mutable"))
        .groupBy("src_cluster", "xpath", "dst_cluster", "dst_url")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .select(
            "src_cluster",
            F.concat(
                "xpath", F.lit('[@href="'), "dst_url", F.lit('"]')
            ).alias("xpath"),
            "dst_cluster",
            F.lit("menu").alias("link_type"),
            F.lit("fixed").alias("menu_type"),
            "n_edges",
        )
    )
    menus = menus_mutable.unionByName(menus_fixed)
    flat = (
        pl2.filter(F.col("n_dst_clusters") <= 1)
        .groupBy("src_cluster", "xpath", "dst_cluster")
        .agg(
            F.max("avg_hrefs").alias("avg_hrefs"),
            F.count(F.lit(1)).alias("n_edges"),
        )
        .select(
            "src_cluster",
            "xpath",
            "dst_cluster",
            F.when(F.col("avg_hrefs") > 1.0, F.lit("list"))
            .otherwise(F.lit("singleton"))
            .alias("link_type"),
            F.lit(None).cast("string").alias("menu_type"),
            "n_edges",
        )
    )
    return menus.unionByName(flat)


def cluster_names(assigned: DataFrame, max_titles: int = 3) -> dict[int, str]:
    """Class name = id + up to 3 member titles (ModelPageClass.name())."""
    rows = (
        assigned.groupBy("cluster_id")
        .agg(F.slice(F.sort_array(F.collect_set("title")), 1, max_titles).alias("ts"))
        .collect()
    )
    return {
        r["cluster_id"]: f"{r['cluster_id']}_" + ",".join(r["ts"] or [])
        for r in rows
    }


def build_navigation_model(
    assigned: DataFrame, root_url: str, names: dict[int, str] | None = None
) -> NavigationModel:
    """Assemble a NavigationModel (same type the static loader returns)
    from clustered pages: typed class links + BFS depths from the
    cluster containing ``root_url``."""
    cl = class_links_from_pages(assigned).collect()
    root_row = assigned.filter(F.col("url") == root_url).select("cluster_id").first()
    if root_row is None:
        raise ValueError(f"root url {root_url!r} not found in assigned pages")
    names = names or cluster_names(assigned)

    def nm(cid: int) -> str:
        return names.get(cid, str(cid))

    model = NavigationModel(root=nm(root_row["cluster_id"]))
    for r in sorted(cl, key=lambda r: (r["src_cluster"], r["xpath"])):
        model.class_links.append(
            {
                "src_class": nm(r["src_cluster"]),
                "xpath": r["xpath"],
                "dst_class": nm(r["dst_cluster"]),
                "link_type": r["link_type"],
                "anchor_text": None,
                "menu_href": None,
                "menu_type": r["menu_type"],
            }
        )
    model.assign_depths()
    return model


def links_distance(
    links_a: set[tuple], links_b: set[tuple]
) -> float:
    """C8 link-set distance (ModelCostCalculator.distanceLinks:177-186).

    Two empty sets yield Java's ``0/0.0 = NaN`` — every comparison with
    NaN is false, so two link-less classes are NEVER merged by the
    ``distance < MIN_DISTANCE`` predicate. Returning 0.0 here would
    wrongly collapse them."""
    union = len(links_a | links_b)
    if union == 0:
        return float("nan")
    return len(links_a ^ links_b) / union
