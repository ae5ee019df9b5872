"""Unit tests for the distributed graph/relational operators backing the
new __spark_entry__ queries: BFS depth assignment (SURVEY C10 at data
scale) and the vectorized LSH bucket UDF (ANN scale path)."""

from pyspark.sql import functions as F


def test_bfs_depths_chain_with_cycle(spark):
    # 0→1→2→3→0 cycle plus a branch 1→4; node 9 unreachable
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4), (9, 9)], "src long, dst long"
    )
    from smart_crawler_spark.operators.relational import bfs_depths

    got = {
        r["node"]: r["depth"]
        for r in bfs_depths(edges, start=0, max_depth=6).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2}


def test_bfs_depths_bounded(spark):
    # a 10-chain cut at max_depth=3
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    from smart_crawler_spark.operators.relational import bfs_depths

    got = bfs_depths(edges, start=0, max_depth=3)
    assert got.count() == 4
    assert got.agg(F.max("depth")).first()[0] == 3


def test_band_buckets_udf_matches_expression(spark):
    """The batched pandas-UDF bucket keys must equal the per-band
    expression form (same planes, same packing) away from the sign
    boundary."""
    import numpy as np

    from smart_crawler_spark.operators.simsearch import (
        band_buckets_udf,
        hyperplanes,
        simhash_bits,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    vecs = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(50)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    bands, bits = 3, 5
    udf_rows = df.select(
        "vec_id", band_buckets_udf(16, bands, bits)("embedding").alias("bk")
    ).collect()
    expr_cols = [
        simhash_bits(F.col("embedding"), hyperplanes(16, bits, seed=101 + b)).alias(
            f"b{b}"
        )
        for b in range(bands)
    ]
    expr_rows = df.select("vec_id", *expr_cols).collect()
    exp = {r["vec_id"]: [r[f"b{b}"] for b in range(bands)] for r in expr_rows}
    for r in udf_rows:
        assert list(r["bk"]) == exp[r["vec_id"]], r["vec_id"]
