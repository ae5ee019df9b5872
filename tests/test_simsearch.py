"""ANN recall: the approximate paths (hyperplane-LSH buckets, IVF
probe) must recover most of the exact brute-force top-k on the driver's
embeddings table — and IVF centroid construction must be deterministic."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.operators import simsearch

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").localCheckpoint()
    return df


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


@needs_testdata
def test_ivf_recall_vs_brute(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(simsearch.cosine_topk(queries, emb, k=5))
    approx = _topk_sets(
        simsearch.ivf_topk(queries, emb, k=5, n_cells=8, n_probe=4)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    assert recall >= 0.7, recall


@needs_testdata
def test_ivf_centroids_deterministic(spark, emb):
    c1 = simsearch.ivf_centroids_kmeans(emb, n_cells=8, iters=2)
    c2 = simsearch.ivf_centroids_kmeans(emb, n_cells=8, iters=2)
    assert np.allclose(c1, c2)


@needs_testdata
def test_lsh_recall_vs_brute(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(simsearch.cosine_topk(queries, emb, k=5))
    approx = _topk_sets(
        simsearch.lsh_bucketed_topk(
            queries, emb, k=5, bands=16, bits_per_band=4, dim=64
        )
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    # recall is the (bands, bits) dial: 8x4 gives ~0.64 here, 16x4 more
    assert recall >= 0.7, recall
