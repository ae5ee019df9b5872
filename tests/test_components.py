"""Connected components over near-dup pair tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.operators.components import (
    connected_components,
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
