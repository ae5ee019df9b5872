"""Connected components over near-dup pair tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.operators.components import (
    connected_components,
    connected_components_star,
    dedup_groups,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_components_and_singleton(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    nodes = spark.range(1, 13).select(F.col("id"))
    got = {
        (r["id"], r["comp"])
        for r in connected_components(e, nodes=nodes).collect()
    }
    assert (1, 1) in got and (2, 1) in got and (3, 1) in got
    assert (10, 10) in got and (11, 10) in got
    # isolated nodes are singletons of themselves
    for iso in (4, 5, 6, 7, 8, 9, 12):
        assert (iso, iso) in got


def test_long_path_converges(spark):
    # a 33-node path: worst case for plain propagation (diameter 32);
    # pointer jumping must converge well inside max_iter=30
    e = _edges(spark, [(i, i + 1) for i in range(1, 33)])
    got = connected_components(e).collect()
    assert {r["comp"] for r in got} == {1}
    assert len(got) == 33


def test_edge_orientation_irrelevant(spark):
    fwd = connected_components(_edges(spark, [(5, 2), (2, 9)])).collect()
    rev = connected_components(_edges(spark, [(9, 2), (2, 5)])).collect()
    assert sorted(map(tuple, fwd)) == sorted(map(tuple, rev))


def test_dedup_groups_survivor_set(spark):
    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(3, 7), (7, 12), (40, 41)], "id_a long, id_b long"
    )
    comp = dedup_groups(pairs, docs)
    survivors = comp.filter("component = doc_id").count()
    # 100 docs, clusters {3,7,12} and {40,41} lose 3 members total
    assert survivors == 97
    by_doc = {r["doc_id"]: r["component"] for r in comp.collect()}
    assert by_doc[3] == by_doc[7] == by_doc[12] == 3
    assert by_doc[40] == by_doc[41] == 40


def test_self_loop_and_duplicate_edges(spark):
    e = _edges(spark, [(1, 1), (1, 2), (2, 1), (1, 2)])
    got = {(r["id"], r["comp"]) for r in connected_components(e).collect()}
    assert got == {(1, 1), (2, 1)}


def test_star_variant_basic_contract(spark):
    """connected_components_star honours the same contract: isolated
    nodes, self-loops, duplicate edges, orientation-free."""
    e = _edges(spark, [(1, 1), (1, 2), (2, 1), (9, 2), (40, 41)])
    nodes = spark.range(1, 6).select(F.col("id"))
    got = {
        (r["id"], r["comp"])
        for r in connected_components_star(e, nodes=nodes).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 3), (4, 4), (5, 5)}
    # edges-only universe keeps the self-loop node and off-universe ids
    got2 = {
        (r["id"], r["comp"])
        for r in connected_components_star(e).collect()
    }
    assert got2 == {(1, 1), (2, 1), (9, 1), (40, 40), (41, 40)}


def _union_find(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id reachable
    roots = [find(x) for x in range(n_nodes)]
    comp_min = {}
    for x, r in enumerate(roots):
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[r] for x, r in enumerate(roots)}


def test_differential_100_random_graphs_incl_long_paths(spark):
    """100 random graphs — paths with diameter up to 1000 (>> 30),
    cliques, random sparse graphs, dumbbells — disjoint-unioned into ONE
    edge table via node-id offsets, solved by BOTH implementations in a
    single run each, and checked against a driver union-find. Also pins
    round counts: both converge far below their max_iter on the
    1000-diameter path (pointer jumping is O(log d); star is O(log^2 n)
    diameter-independent)."""
    import random

    rng = random.Random(20260818)
    all_edges: list[tuple[int, int]] = []
    truth: dict[int, int] = {}
    offset = 0
    for g in range(100):
        kind = g % 4
        if kind == 0:  # long path: diameter 60..1000
            n = rng.randrange(61, 1001)
            pairs = [(i, i + 1) for i in range(n - 1)]
        elif kind == 1:  # clique
            n = rng.randrange(3, 12)
            pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
        elif kind == 2:  # sparse random (possibly disconnected)
            n = rng.randrange(10, 60)
            pairs = [
                (rng.randrange(n), rng.randrange(n))
                for _ in range(rng.randrange(n // 2, n))
            ]
        else:  # dumbbell: two cliques joined by a path
            k, plen = rng.randrange(3, 7), rng.randrange(31, 120)
            left = [(i, j) for i in range(k) for j in range(i + 1, k)]
            path = [(k - 1 + i, k + i) for i in range(plen)]
            n = k + plen
            pairs = left + path
        local = _union_find(n, pairs)
        # random orientation per edge
        all_edges += [
            (a + offset, b + offset) if rng.random() < 0.5
            else (b + offset, a + offset)
            for a, b in pairs
        ]
        truth.update({x + offset: c + offset for x, c in local.items()})
        offset += n

    e = spark.createDataFrame(all_edges, "src long, dst long")
    nodes = spark.range(offset).select(F.col("id"))
    s_prop, s_star = {}, {}
    got_prop = {
        r["id"]: r["comp"]
        for r in connected_components(e, nodes=nodes, stats=s_prop).collect()
    }
    got_star = {
        r["id"]: r["comp"]
        for r in connected_components_star(
            e, nodes=nodes, stats=s_star
        ).collect()
    }
    assert got_prop == truth
    assert got_star == truth
    # diameter <= 1000: pointer-jumping needs ~log2(1000) + slack rounds
    assert s_prop["rounds"] <= 15, s_prop
    assert s_star["rounds"] <= 15, s_star


def test_keep_best_argmax_and_ties(spark):
    """Each component keeps its highest-quality member; quality ties
    break to the lowest id; singletons keep themselves."""
    from smart_crawler_spark.operators.components import keep_best

    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)],
        "doc_id long, component long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (8, 0.5), (9, 0.1)],
        "doc_id long, quality double",
    )
    out = {r["doc_id"]: r for r in keep_best(groups, scores).collect()}
    assert out[2]["keep"] and out[2]["kept_id"] == 2  # argmax
    assert not out[3]["keep"]  # tie -> lower id wins
    assert out[7]["keep"] and not out[8]["keep"]  # tie -> lower id
    assert out[9]["keep"] and out[9]["group_size"] == 1
    assert out[1]["group_size"] == 3
