"""Structural-clustering modeler: C1 signature grouping, C2 label split,
C3 distance collapse, C4 MDL merge, C9-C11 graph building, C12 golden
eval — on the synthetic site (true classes known) and on hand-built
micro-cases pinning the reference formulas."""

import math

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.datagen.site import (
    SiteConfig,
    generate_site_pages,
)
from smart_crawler_spark.modeler.cluster import (
    ClusterStats,
    CostModel,
    cluster_pages,
    collapsed,
    distance,
    mdl_update,
)
from smart_crawler_spark.modeler.evaluate import evaluate_model
from smart_crawler_spark.modeler.graph import build_navigation_model

CFG = SiteConfig(n_hosts=2, dirs=2, chain=3, details_per_page=3, n_images=30)


def _modeler_input(pages_df):
    return pages_df.select(
        "url",
        "title",
        "link_schema",
        F.col("data_values").alias("label_values"),
        "out_links",
    )


@pytest.fixture(scope="module")
def clustered(spark):
    pages = generate_site_pages(spark, CFG).localCheckpoint()
    model, assigned = cluster_pages(_modeler_input(pages))
    return pages, model, assigned.localCheckpoint()


def test_clusters_match_true_classes(spark, clustered):
    pages, model, assigned = clustered
    # true classes: home, dir0, dir1, detail, about; dir0/dir1 share a
    # schema (same xpaths) => the modeler may merge them: >= 4 clusters
    got = (
        assigned.join(pages.select("url", "true_class"), "url")
        .groupBy("cluster_id")
        .agg(F.collect_set("true_class").alias("tcs"))
        .collect()
    )
    by_cluster = {r["cluster_id"]: set(r["tcs"]) for r in got}
    # no cluster mixes detail/home/about with anything else
    for tcs in by_cluster.values():
        non_dir = {t for t in tcs if not t.startswith("dir")}
        assert len(non_dir) <= 1 and (not non_dir or len(tcs) == len(non_dir))
    # home, detail, about each recovered as pure clusters
    pure = [t for tcs in by_cluster.values() for t in tcs if len(tcs) == 1]
    assert {"home", "detail", "about"} <= set(pure)


def test_golden_eval_scores(spark, clustered):
    _pages, _model, assigned = clustered
    golden = spark.createDataFrame(
        [
            ("home", r"^http://[^/]+/$"),
            ("dir", r"^http://[^/]+/dir\d(/page\d+)?$"),
            ("detail", r"^http://[^/]+/detail/\d+$"),
            ("about", r"^http://[^/]+/about$"),
        ],
        "class string, url_pattern string",
    )
    rep = evaluate_model(assigned, golden)
    assert rep.fmeasure > 0.95
    assert rep.purity > 0.95
    assert rep.cohesion < 0.1  # near-zero entropy = clean clusters


def test_model_graph_and_depths(spark, clustered):
    pages, _model, assigned = clustered
    nav = build_navigation_model(assigned, f"http://{CFG.host(0)}/")
    assert nav.depths[nav.root] == 0
    # detail pages are 2 hops from home; list links detected as 'list'
    types = {e["link_type"] for e in nav.class_links}
    assert "list" in types and ("menu" in types or "singleton" in types)
    max_depth = max(nav.depths.values())
    assert max_depth == 2
    # dir -> detail edge exists and is a list
    list_edges = [e for e in nav.class_links if e["link_type"] == "list"]
    assert any(e["xpath"].startswith('//div[@id="content"]') for e in list_edges)


def test_reference_distance_formula():
    a = ClusterStats("a", 2, 0, [], {"x1": 2, "x2": 2}, {})
    b = ClusterStats("b", 1, 0, [], {"x2": 1, "x3": 1}, {})
    # symmetric diff {x1,x3} / union {x1,x2,x3}
    assert distance(a, b) == pytest.approx(2 / 3)
    c = ClusterStats("c", 1, 0, [], {"x1": 1, "x2": 1}, {})
    assert distance(a, c) == 0.0
    d = ClusterStats("d", 1, 0, [], {"y": 1}, {})
    assert distance(a, d) == 1.0


def test_collapse_loop_order():
    # reference loop: i ascending, j descending; c2 merges into c1,
    # then c3 merges into the grown c1
    c1 = ClusterStats("c1", 2, 0, [], {"x1": 2, "x2": 2}, {})
    c2 = ClusterStats("c2", 1, 0, [], {"x1": 1, "x2": 1}, {})
    c3 = ClusterStats("c3", 1, 0, [], {"x1": 1, "x2": 1, "x3": 1}, {})
    out = collapsed([c1, c2, c3], lambda a, b: distance(a, b) < 0.4)
    assert len(out) == 1 and out[0].size == 4
    assert set(out[0].members) == {"c1", "c2", "c3"}


def test_mdl_merges_similar_singletons():
    # two near-identical clusters (same schema) must merge under MDL;
    # a disjoint-schema cluster must stay separate
    idf = {x: math.log(4 / 2) for x in ("a", "b")} | {"z": math.log(4 / 1)}
    cost = CostModel(idf)
    c1 = ClusterStats("c1", 2, 4, [], {"a": 2, "b": 2}, {})
    c2 = ClusterStats("c2", 1, 2, [], {"a": 1, "b": 1}, {})
    c3 = ClusterStats("c3", 1, 9, [], {"z": 1}, {})
    model = mdl_update([], [c1, c2, c3], cost)
    sizes = sorted(c.size for c in model)
    assert sizes == [1, 3]


def test_label_schema_requires_repeated_text():
    c = ClusterStats(
        "c", 3, 0, [], {},
        {("//h1/text()", "Same"): 2, ("//p/text()", "uniq1"): 1,
         ("//p/text()", "uniq2"): 1},
    )
    assert c.label_schema == {"//h1/text()"}
    assert c.label_df == {"//h1/text()": 2, "//p/text()": 2}


def test_lsh_pair_pruning_equals_exact(spark):
    """The LSH-pruned C3 collapse reaches the same final clusters as the
    exact all-pairs loop on a wider multi-host corpus."""
    from smart_crawler_spark.modeler.cluster import cluster_pages as cp

    cfg = SiteConfig(n_hosts=3, dirs=3, chain=2, details_per_page=2, n_images=20)
    pages = _modeler_input(generate_site_pages(spark, cfg)).localCheckpoint()
    exact_model, exact_assign = cp(pages, use_lsh_pairs=False, collect_urls=True)
    lsh_model, lsh_assign = cp(pages, use_lsh_pairs=True, collect_urls=True)
    exact_sets = sorted(
        tuple(sorted(c.urls)) for c in exact_model
    )
    lsh_sets = sorted(tuple(sorted(c.urls)) for c in lsh_model)
    assert exact_sets == lsh_sets
