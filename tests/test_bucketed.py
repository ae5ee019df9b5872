"""Bucketed-table co-located joins: the scan's output partitioning must
satisfy join/agg distribution so Catalyst plans no Exchange on the
bucketed side — the layout the 10^10-key seen table uses at scale
(sources/bucketed.py)."""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from smart_crawler_spark.sources.bucketed import write_bucketed

    loc = str(tmp_path_factory.mktemp("bucketed_wh"))
    seen = spark.range(20_000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
    )
    cand = spark.range(10_000, 40_000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
    )
    seen_t = write_bucketed(
        seen, "seen", key="url_hash", n_buckets=8,
        database="buckdb", location=loc,
    )
    cand_t = write_bucketed(
        cand, "cand", key="url_hash", n_buckets=8,
        database="buckdb", location=loc,
    )
    yield seen_t, cand_t
    spark.sql("DROP TABLE IF EXISTS buckdb.seen")
    spark.sql("DROP TABLE IF EXISTS buckdb.cand")
    spark.sql("DROP DATABASE IF EXISTS buckdb")


def test_bucket_spec_recorded(spark, bucketed_tables):
    from smart_crawler_spark.sources.bucketed import bucket_spec

    seen_t, _ = bucketed_tables
    spec = bucket_spec(spark, seen_t)
    assert spec["n_buckets"] == 8
    assert "url_hash" in spec["bucket_cols"]


def test_bucketed_antijoin_has_no_exchange(spark, bucketed_tables):
    """The seen-filter shape: candidates anti-join seen on the bucket
    key. Both sides bucketed by url_hash with equal counts -> no
    shuffle anywhere in the plan."""
    seen_t, cand_t = bucketed_tables
    q = (
        spark.table(cand_t)
        .hint("merge")
        .join(spark.table(seen_t), "url_hash", "left_anti")
    )
    plan = _plan(q)
    assert "Exchange" not in plan, plan
    # and it is the correct anti-join result
    assert q.count() == 20_000


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key aggregates in place (single-phase
    HashAggregate, no Exchange)."""
    _, cand_t = bucketed_tables
    q = spark.table(cand_t).groupBy("url_hash").agg(F.count("*").alias("n"))
    plan = _plan(q)
    assert "Exchange" not in plan, plan
    assert q.count() == 30_000


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    """Control: the same join against an unbucketed copy must shuffle —
    proves the no-Exchange assertion above is the bucketing, not AQE."""
    seen_t, cand_t = bucketed_tables
    plain = spark.table(seen_t).repartition(4)
    q = spark.table(cand_t).hint("merge").join(plain, "url_hash", "left_anti")
    assert "Exchange" in _plan(q)
