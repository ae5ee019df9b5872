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


def test_pca_fit_project_matches_numpy(spark):
    import numpy as np

    from smart_crawler_spark.operators.simsearch import pca_fit, pca_project

    rng = np.random.Generator(np.random.PCG64(7))
    # anisotropic cloud so the component order is unambiguous
    base = rng.normal(size=(200, 6)) * np.array([10, 5, 2, 1, 0.5, 0.1])
    mix = rng.normal(size=(6, 6))
    data = base @ mix
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        ["vec_id", "embedding"],
    )
    mean, comps, evar = pca_fit(df, n_components=3)
    assert np.allclose(mean, data.mean(axis=0), atol=1e-9)
    cov = np.cov(data, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    assert np.allclose(evar, w[order], rtol=1e-9)
    # components match up to sign; the sign rule makes them exact
    for got, want in zip(comps, v[:, order].T):
        if want[np.argmax(np.abs(want))] < 0:
            want = -want
        assert np.allclose(got, want, atol=1e-9)
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-12)
    got = (
        pca_project(df, mean, comps)
        .orderBy("vec_id")
        .toPandas()[["pc0", "pc1", "pc2"]]
        .to_numpy()
    )
    want = (data - data.mean(axis=0)) @ comps.T
    assert np.allclose(got, want, atol=1e-8)


def test_semantic_dedup_greedy_keep_rule(spark):
    """SemDeDup keep semantics: drop exactly the vectors with a lower-id
    >= threshold neighbor (greedy by id): in a chain a~b~c with
    cos(a,c) < t, BOTH b and c are dropped (b dups a, c dups b), and a
    boundary-straddling pair is still caught via n_probe=2 multi-probe."""
    import math

    import numpy as np

    def rot(theta):  # unit vector at angle theta in the (x,y) plane
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    t15 = math.radians(15)  # cos 15deg ~ 0.966 >= 0.95; cos 30 ~ 0.866 < t
    rows = [
        (0, rot(0.0)),
        (1, rot(t15)),
        (2, rot(2 * t15)),
        (3, [0.0, 0.0, 0.0, 1.0]),          # isolated
        (4, [0.0, 0.70, 0.714, 0.0]),       # near the y/z cell boundary
        (5, [0.0, 0.714, 0.70, 0.0]),       # its cross-boundary near-dup
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    cents = np.array(
        [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    )
    got = {
        r["vec_id"]: (r["keep"], r["dup_of"])
        for r in simsearch.semantic_dedup(
            df, threshold=0.95, n_probe=2, centroids=cents
        ).collect()
    }
    # brute-force expectation
    vecs = {i: np.asarray(v) for i, v in rows}
    for i in vecs:
        lower = [
            j for j in vecs
            if j < i
            and float(
                vecs[i] @ vecs[j]
                / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j]))
            ) >= 0.95
        ]
        want = (True, None) if not lower else (False, min(lower))
        assert got[i] == want, (i, got[i], want)
    assert got[1] == (False, 0) and got[2] == (False, 1)  # the chain
    assert got[4][0] is True and got[5] == (False, 4)  # boundary pair


def test_quantize_embeddings(spark):
    """Error bound scale/2 holds on every vector; codes stay in
    [-127, 127]; a zero vector quantizes exactly; dequantized cosine
    vs the original stays near 1 (the ANN-compatibility property)."""
    import math

    from smart_crawler_spark.operators.simsearch import quantize_embeddings

    vecs = [
        (0, [1.0, -2.0, 3.5, 0.25]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [-127.0, 127.0, 1.0, -1.0]),
        (3, [1e-5, 2e-5, -3e-5, 4e-5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for vid, v in vecs:
        r = out[vid]
        assert all(-127 <= c <= 127 for c in r["q"])
        if max(abs(x) for x in v) == 0:
            assert r["scale"] == 0.0 and r["max_abs_err"] == 0.0
            assert all(c == 0 for c in r["q"])
            continue
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
        deq = [c * r["scale"] for c in r["q"]]
        dot = sum(a * b for a, b in zip(v, deq))
        cos = dot / (
            math.sqrt(sum(a * a for a in v))
            * math.sqrt(sum(b * b for b in deq))
        )
        assert cos > 0.999, (vid, cos)
    plan = (
        quantize_embeddings(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "ArrowEval" not in plan, plan


@needs_testdata
def test_pq_codebooks_shape_and_determinism(spark, emb):
    cb1 = simsearch.pq_codebooks(emb, m=8, n_codes=16)
    cb2 = simsearch.pq_codebooks(emb, m=8, n_codes=16)
    dim = len(emb.first()["embedding"])
    assert cb1.shape == (8, 16, dim // 8)
    assert np.allclose(cb1, cb2)
    # codes cover the range and stay in [0, k)
    codes = simsearch.pq_encode(emb, cb1).collect()
    flat = [c for r in codes for c in r["codes"]]
    assert min(flat) >= 0 and max(flat) < 16
    assert len({tuple(r["codes"]) for r in codes}) > len(codes) // 2


@needs_testdata
def test_pq_planted_top1_exact_and_rescore(spark, emb):
    """The gate semantics: a planted near-copy query (w = v_i +
    0.18*v_{i+1}, true sim ~0.98 vs ~0 noise background) must come back
    with the exact brute-force top-1 — ADC distortion is bounded far
    below that margin. (Top-5 over PURE-NOISE neighbors is deliberately
    NOT asserted: with all true sims ~0 the ranking is tie-breaking
    noise, which lossy codes cannot and need not preserve — that case
    is what the exact rescore/IVF paths are for.) Reported sims must be
    the exact cosine, not the ADC estimate."""
    nxt = emb.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("_e2"),
    )
    queries = (
        emb.filter(F.col("vec_id") < 8)
        .join(nxt, "vec_id")
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("_e2").cast("array<double>"),
                lambda a, b: a + 0.18 * b,
            ).alias("embedding"),
        )
    )
    bf = simsearch.cosine_topk(queries, emb, k=1)
    pq = simsearch.pq_topk(queries, emb, k=1, m=8, n_codes=16)
    want = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in bf.collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in pq.collect()
    }
    assert got == want  # same neighbor AND the exact (rescored) sim
    # ranks in a k=5 output come from the exact rescore: descending sims
    out = simsearch.pq_topk(queries, emb, k=5, m=8, n_codes=16).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for sims in by_q.values():
        ordered = [s for _, s in sorted(sims)]
        assert ordered == sorted(ordered, reverse=True)


@needs_testdata
def test_pq_guards(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        simsearch.pq_codebooks(emb, m=7, n_codes=8)
    with pytest.raises(ValueError, match="dense integer ids"):
        simsearch.pq_codebooks(
            emb.withColumn("vec_id", F.col("vec_id") + 10_000_000),
            m=8, n_codes=16,
        )


@needs_testdata
def test_ivfpq_planted_top1_exact(spark, emb):
    """IVF-PQ recovers the exact brute-force top-1 for planted
    near-copy queries, with the exact rescored sim — and the rerank
    window is what makes it robust (the true neighbor can sit at ADC
    rank 2 on this corpus; rerank=8k rescores past it)."""
    nxt = emb.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("_e2"),
    )
    queries = (
        emb.filter(F.col("vec_id") < 8)
        .join(nxt, "vec_id")
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("_e2").cast("array<double>"),
                lambda a, b: a + 0.18 * b,
            ).alias("embedding"),
        )
    )
    bf = simsearch.cosine_topk(queries, emb, k=1)
    ivfpq = simsearch.ivfpq_topk(
        queries, emb, k=1, n_cells=8, n_probe=4, m=8, n_codes=16
    )
    want = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in bf.collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in ivfpq.collect()
    }
    assert got == want
    # output honors k: at k=3 each query returns exactly 3 ranked rows
    out = simsearch.ivfpq_topk(
        queries, emb, k=3, n_cells=8, n_probe=4, m=8, n_codes=16
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())
