"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k — the exactness baseline.
  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side higher-
  order functions, no Python).
- ``lsh_bucketed_topk``: the scale path — random-hyperplane (SimHash)
  LSH buckets with multi-probe over band tables; only candidates sharing
  a band bucket are scored, turning the O(N·Q) cross join into a
  bucket-equi-join. Recall is tunable by (bands, bits).
- ``embedding_near_dup_pairs``: near-duplicate pairs by cosine >= t.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self) by cosine.

    Scale shape: broadcast the (small) query set against the corpus —
    one scan of the corpus, partial top-k per partition via the window
    after AQE coalescing. For large query sets use lsh_bucketed_topk.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rk").alias("rank"))
    )


def hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((bits, dim))


def simhash_bits(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign bits of hyperplane projections as an int64 signature —
    expressed with higher-order functions over the array column.

    (Kept for single-band use; the bucketed search below batches ALL
    bands into one vectorized pandas UDF — one BLAS matmul per Arrow
    batch — because a per-band literal-array expression tree explodes
    codegen size at bands × bits × dim literals.)"""
    v = vec_col.cast("array<double>")
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, u: acc + u,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return sig


def band_buckets_udf(dim: int, bands: int, bits_per_band: int, seed0: int = 101):
    """Vectorized pandas UDF: embedding -> array<long> of per-band LSH
    bucket keys. One (batch × dim) @ (dim × bands·bits) matmul per Arrow
    batch; sign bits packed per band."""
    from pyspark.sql.functions import pandas_udf

    all_planes = np.vstack(
        [hyperplanes(dim, bits_per_band, seed=seed0 + b) for b in range(bands)]
    )  # (bands*bits, dim)
    weights = (1 << np.arange(bits_per_band, dtype=np.int64))

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)  # (n, dim)
        proj = mat @ all_planes.T  # (n, bands*bits)
        bits = (proj > 0).reshape(len(mat), bands, bits_per_band)
        keys = (bits * weights).sum(axis=2).astype(np.int64)  # (n, bands)
        return pd.Series(list(keys))

    return buckets


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bands: int = 4,
    bits_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing >=1 LSH band.

    Each vector gets ``bands`` bucket keys (independent hyperplane sets);
    query and corpus are joined on (band, bucket) — a shuffle equi-join
    that prunes the candidate set by ~2^bits per band.
    """
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    buckets = band_buckets_udf(dim, bands, bits_per_band)

    # the band explode + bucket join carry IDS ONLY: shipping the
    # vectors through the band shuffle would replicate every embedding
    # ``bands``× (the 100 TB killer); the deduped candidate pairs
    # re-join each side's vector exactly once for scoring
    def with_buckets(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(name),
            F.posexplode(buckets(F.col(vec_col))).alias("band", "bucket"),
        )

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(corpus, "neighbor_id")
    pairs = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        pairs.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rk").alias("rank"))
    )


def _ivf_cell_udf(centroids: np.ndarray, n_probe: int):
    """Vectorized pandas UDF: embedding -> array<int> of the n_probe
    nearest centroid ids (cosine). One matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf("array<int>")
    def cells(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cn.T  # (n, n_cells)
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return cells


def ivf_centroids_kmeans(
    corpus: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,  # coarse quantizer: assignment stabilizes fast and
    # each Lloyd iteration is a full corpus scan + driver collect
) -> np.ndarray:
    """Deterministic coarse quantizer: seed centroids from a fixed
    stride sample of the corpus (vec_id order), then a few Lloyd
    iterations as DataFrame aggregations (assign = matmul UDF,
    update = groupBy mean over exploded components). Deterministic
    because init is id-ordered, not random-partition-dependent.

    The corpus is cached for the duration: each iteration re-scans it
    (assign UDF + component explode), and the count/seed pass adds two
    more — at k×iters jobs the scan must not re-read parquet."""
    corpus = corpus.select(id_col, vec_col).persist()
    try:
        n = corpus.count()
        stride = max(n // n_cells, 1)
        seed_rows = (
            corpus.filter(
                (F.col(id_col) % stride == 0) & (F.col(id_col) < stride * n_cells)
            )
            .orderBy(id_col)
            .select(vec_col)
            .collect()
        )
        centroids = np.asarray([r[0] for r in seed_rows], dtype=np.float64)
        if centroids.size == 0:
            # the stride seed assumes dense integer ids from 0 (the
            # corpus-table convention); offset/sparse/hashed ids would
            # otherwise yield zero centroids and an EMPTY ivf_topk
            # result with no error — fail loudly instead
            raise ValueError(
                f"stride seeding selected no rows ({id_col} % {stride}"
                f" == 0, < {stride * n_cells}): ivf_centroids_kmeans"
                f" requires dense integer ids starting at 0; remap ids"
                f" (e.g. row_number) before quantizing"
            )
        for _ in range(iters):
            assign = _ivf_cell_udf(centroids, 1)
            assigned = corpus.select(
                F.element_at(assign(F.col(vec_col)), 1).alias("cell"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
            means = (
                assigned.select("cell", F.posexplode("v").alias("i", "x"))
                .groupBy("cell", "i")
                .agg(F.avg("x").alias("m"))
                .groupBy("cell")
                .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("ms"))
                .select("cell", F.transform("ms", lambda s: s["m"]).alias("centroid"))
                .collect()
            )
            for r in means:
                centroids[r["cell"]] = np.asarray(r["centroid"], dtype=np.float64)
    finally:
        corpus.unpersist()
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single
    nearest-centroid cell (the inverted file); each query probes its
    ``n_probe`` nearest cells and scores only those candidates — the
    equi-join on cell replaces the O(N·Q) cross join. Recall is tuned by
    n_probe/n_cells; at 100 TB the corpus side is written bucketed by
    cell so probes are partition-pruned scans."""
    if centroids is None:
        centroids = ivf_centroids_kmeans(corpus, n_cells, id_col, vec_col)
    c_assign = _ivf_cell_udf(centroids, 1)
    q_assign = _ivf_cell_udf(centroids, n_probe)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("cell"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(q_assign(F.col(vec_col))).alias("cell"),
    )
    scored = (
        qb.join(cb, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rk").alias("rank"))
    )


def embedding_near_dup_lsh(
    corpus: DataFrame,
    threshold: float = 0.95,
    bands: int = 16,
    bits_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs via the scale plan: hyperplane-LSH
    band buckets generate candidates (self equi-join on (band, bucket) —
    never an all-pairs cross join), then exact cosine verifies each
    candidate. Because verification is exact, the output equals the true
    >=threshold pair set wherever banding recall holds; at near-dup
    thresholds (cos >= ~0.9) sign-bit agreement is high, so modest
    bands/bits give recall ~1. The exact cross-join variant below stays
    as the small-scale baseline."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    buckets = band_buckets_udf(dim, bands, bits_per_band)
    # ids only through the band shuffle (vectors would be replicated
    # bands× otherwise); vectors re-join once per side for the exact
    # verification of the deduped candidate pairs
    banded = corpus.select(
        F.col(id_col).alias("vid"),
        F.posexplode(buckets(F.col(vec_col))).alias("band", "bucket"),
    )
    pairs = (
        banded.select(F.col("vid").alias("id_a"), "band", "bucket")
        .join(
            banded.select(F.col("vid").alias("id_b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup-family semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space with the deterministic
    k-means coarse quantizer, generate candidate pairs ONLY within
    clusters, verify each candidate with exact cosine, and drop every
    vector that has a >= ``threshold`` neighbor with a smaller id (the
    deterministic keep-lowest rule; greedy by id, so a kept vector may
    itself have kept near-dups only below threshold).

    Scale shape: the quadratic step is confined to cells (the SemDeDup
    trick — within-cluster pairs, never corpus all-pairs), the cell
    self-join ships IDS ONLY (vectors re-join once per side for the
    exact verify), and each vector enters its ``n_probe`` nearest cells
    so a pair straddling a Voronoi boundary still shares a candidate
    cell (multi-probe; at near-dup cosines the two members' top-probe
    cell sets coincide with overwhelming probability — the oracle gate
    verifies the output equals the brute-force pair rule exactly at
    test scale). At 100 TB the corpus is written bucketed by cell so
    the self-join co-locates without an extra shuffle.

    Output: (id, keep, dup_of) — ``dup_of`` = smallest lower-id
    >= threshold neighbor (null for kept rows)."""
    if centroids is None:
        centroids = ivf_centroids_kmeans(corpus, n_cells, id_col, vec_col)
    assign = _ivf_cell_udf(centroids, n_probe)
    banded = corpus.select(
        F.col(id_col).alias("vid"),
        F.explode(assign(F.col(vec_col))).alias("cell"),
    )
    pairs = (
        banded.select(F.col("vid").alias("id_a"), "cell")
        .join(banded.select(F.col("vid").alias("id_b"), "cell"), "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    dup_of = (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cosine(F.col("_va"), F.col("_vb")) >= threshold)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    return corpus.select(F.col(id_col)).join(
        dup_of, F.col(id_col) == F.col("id_b"), "left"
    ).select(
        id_col,
        F.col("dup_of").isNull().alias("keep"),
        "dup_of",
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (i<j) with cosine >= threshold."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def pca_fit(
    embeddings: DataFrame,
    n_components: int,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed PCA fit: (mean, components[k,d], explained_var[k]).

    The corpus never leaves the executors — the driver receives only
    d + d(d+1)/2 + 1 aggregates (mean vector, upper-triangle second
    moments, count) from ONE map-side-partial aggregation over the
    flattened (i, j, v_i*v_j) stream, then runs the d×d eigensolve
    locally (numpy eigh; d is the embedding width, e.g. 64 → a 4 KB
    problem). Eigenvector sign is fixed deterministically (largest-
    magnitude coordinate made positive) so repeated fits and resumed
    jobs project identically."""
    flat = embeddings.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "v")
    )
    d = embeddings.select(
        F.size(vec_col).alias("d")
    ).first()["d"]
    # second-moment upper triangle: pair each element with the tail of
    # its own row via a self-zip inside the row — no self-join; the
    # (i, j) key space is d(d+1)/2, corpus-size-independent
    pairs = embeddings.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "vi"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).select(
        "i",
        "vi",
        F.posexplode(F.slice("vec", F.col("i") + 1, F.lit(d))).alias(
            "dj", "vj"
        ),
    )
    moments = (
        pairs.groupBy("i", "dj")
        .agg(F.sum(F.col("vi") * F.col("vj")).alias("sxy"))
        .collect()
    )
    sums = flat.groupBy("i").agg(
        F.sum("v").alias("s"), F.count("v").alias("n")
    ).collect()
    n = sums[0]["n"]
    mean = np.zeros(d)
    for r in sums:
        mean[r["i"]] = r["s"] / n
    m2 = np.zeros((d, d))
    for r in moments:
        i, j = r["i"], r["i"] + r["dj"]
        m2[i, j] = m2[j, i] = r["sxy"]
    cov = m2 / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:n_components]
    comps = eigvec[:, order].T  # (k, d)
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    return mean, comps, eigval[order]


def pca_project(
    embeddings: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project every embedding onto the fitted components — map-only:
    the (k, d) component matrix rides into the plan as array literals
    and the dot products run as JVM higher-order functions (zip_with +
    aggregate), no Python, no shuffle."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(x)) for x in mean]),
        lambda x, m: x - m,
    )
    projs = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(w)) for w in comp]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(f"pc{ci}")
        for ci, comp in enumerate(components)
    ]
    return embeddings.select(F.col(id_col), *projs)


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the 4x storage shrink a
    100 TB embedding corpus takes before ANN indexing: scale =
    max|v|/127, q_i = floor(v_i/scale + 0.5) in [-127, 127], with the
    per-vector max reconstruction error reported (bounded by scale/2
    by construction — asserted in tests, replayed by the oracle).
    All JVM higher-order array functions (transform/aggregate): no
    Python, no shuffle, parquet-IO bound. Zero vectors quantize to
    all-zero with scale 0 (exact)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = max_abs / F.lit(127.0)
    q = F.when(max_abs == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")
        )
    )
    err = F.when(max_abs == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.zip_with(
                v,
                q,
                lambda x, qi: F.abs(x - qi.cast("double") * scale),
            ),
            F.lit(0.0),
            lambda acc, e: F.greatest(acc, e),
        )
    )
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("q"),
        err.alias("max_abs_err"),
    )


# --------------------------------------------------- product quantization


def _pq_assign_udf(codebooks: np.ndarray, normalize: bool = True):
    """Vectorized pandas UDF: embedding -> array<int> of m subspace
    codes (argmin L2 to the subspace codebook; on the L2-normalized
    vector unless ``normalize=False`` — the residual-PQ case, where
    the input is already a sphere residual). ``codebooks`` is
    (m, k, d/m). One batched matmul per subspace per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    m, _, sub = codebooks.shape

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        if normalize:
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
        codes = np.empty((len(mat), m), dtype=np.int32)
        for s in range(m):
            x = mat[:, s * sub : (s + 1) * sub]
            d2 = (
                (x**2).sum(1, keepdims=True)
                - 2.0 * x @ codebooks[s].T
                + (codebooks[s] ** 2).sum(1)
            )
            codes[:, s] = d2.argmin(1)
        return pd.Series(list(codes))

    return assign


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    normalize: bool = True,
) -> np.ndarray:
    """Deterministic product-quantizer training: split the (normalized)
    vector into ``m`` subspaces and run a few Lloyd iterations per
    subspace — ALL subspaces updated in one corpus scan per iteration
    (assign via one batched UDF, update via a single groupBy
    (subspace, code, component) mean whose result is m*k*(d/m) driver
    rows). Seeds are the same stride-sampled, id-ordered rows as
    ``ivf_centroids_kmeans``, sliced per subspace — deterministic, not
    partition-order dependent. Returns (m, n_codes, d/m)."""
    corpus = corpus.select(id_col, vec_col).persist()
    try:
        n = corpus.count()
        stride = max(n // n_codes, 1)
        seed_rows = (
            corpus.filter(
                (F.col(id_col) % stride == 0)
                & (F.col(id_col) < stride * n_codes)
            )
            .orderBy(id_col)
            .select(vec_col)
            .collect()
        )
        seeds = np.asarray([r[0] for r in seed_rows], dtype=np.float64)
        if seeds.shape[0] < n_codes:
            raise ValueError(
                f"stride seeding found {seeds.shape[0]} < {n_codes} rows:"
                f" pq_codebooks requires dense integer ids from 0"
                f" (remap with row_number first)"
            )
        d = seeds.shape[1]
        if d % m != 0:
            raise ValueError(f"dim {d} not divisible by m={m} subspaces")
        sub = d // m
        if normalize:
            seeds = seeds / np.maximum(
                np.linalg.norm(seeds, axis=1, keepdims=True), 1e-12
            )
        cb = seeds.reshape(n_codes, m, sub).transpose(1, 0, 2).copy()
        for _ in range(iters):
            assign = _pq_assign_udf(cb, normalize)
            norm = (
                F.transform(
                    F.col(vec_col).cast("array<double>"),
                    lambda x: x
                    / F.greatest(_norm(F.col(vec_col)), F.lit(1e-12)),
                )
                if normalize
                else F.col(vec_col).cast("array<double>")
            )
            comp = (
                corpus.select(
                    assign(F.col(vec_col)).alias("codes"),
                    F.posexplode(norm).alias("j", "x"),
                )
                .select(
                    (F.col("j") / sub).cast("int").alias("s"),
                    (F.col("j") % sub).alias("i"),
                    F.element_at(
                        "codes", (F.col("j") / sub).cast("int") + 1
                    ).alias("code"),
                    "x",
                )
                .groupBy("s", "code", "i")
                .agg(F.avg("x").alias("mu"))
                .collect()
            )
            for r in comp:
                cb[r["s"], r["code"], r["i"]] = r["mu"]
        return cb
    finally:
        corpus.unpersist()


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Encode each vector as m uint8 subspace codes — at (m=8, k=32,
    dim=64 float32) a 32x storage shrink; the decoded approximation
    lives entirely in the (m*k*(d/m))-float codebook every executor
    holds as a broadcast closure."""
    assign = _pq_assign_udf(codebooks, normalize)
    return corpus.select(
        F.col(id_col), assign(F.col(vec_col)).alias("codes")
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 1,
    m: int = 8,
    n_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ ANN with ADC scan + exact rescore — the classic IVF-free PQ
    pipeline (Jegou et al. 2011, "Product quantization for nearest
    neighbor search"): corpus vectors are m uint8 codes; each query
    builds an (m x n_codes) inner-product lookup table once, scores
    every code row by m TABLE LOOKUPS (no d-dim arithmetic), keeps the
    per-partition top-k (correct for a global top-k), and the k global
    winners are rescored with the EXACT cosine against the full vectors
    (rank and reported sim come from the rescore — the standard
    candidate-generation / rerank split).

    Scale shape: the scan side carries only (id, m bytes); queries +
    codebooks + LUTs are broadcast numpy in the Arrow UDF closure; the
    shuffle sees at most (partitions x Q x k) candidate rows; the
    rescore joins k ids back to the corpus by equi-join."""
    if codebooks is None:
        codebooks = pq_codebooks(corpus, m, n_codes, id_col, vec_col)
    m, _, sub = codebooks.shape
    q_rows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    q_mat = q_mat / np.maximum(
        np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12
    )
    # (Q, m, k) inner-product tables: est_dot(q, c) = sum_s lut[q, s, code_s]
    lut = np.einsum(
        "qsd,skd->qsk", q_mat.reshape(len(q_ids), m, sub), codebooks
    )

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            # (Q, n): gather per subspace and sum
            est = lut[:, np.arange(m), codes].sum(axis=2)
            # k+1: a query that IS a corpus row always tops its own
            # partition's ADC list, and the self-match is filtered
            # after the scan — without the +1 that query would come
            # back one neighbor short
            top = min(k + 1, est.shape[1])
            idx = np.argpartition(-est, top - 1, axis=1)[:, :top]
            rows = {
                "query_id": np.repeat(q_ids, top),
                "neighbor_id": ids[idx].ravel(),
                "adc": np.take_along_axis(est, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    codes_df = pq_encode(corpus, codebooks, id_col, vec_col)
    cand = codes_df.mapInPandas(
        scan, f"query_id long, neighbor_id long, adc double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    winners = (
        cand.withColumn("rk", F.row_number().over(w_adc))
        .filter(F.col("rk") <= k)
        .drop("rk", "adc")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    rescored = (
        winners.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return rescored.withColumn("rank", F.row_number().over(w_exact))


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 1,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 32,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ — the production ANN composition (the FAISS IVFPQ shape,
    Jegou et al. 2011): the coarse quantizer (``ivf_centroids_kmeans``)
    assigns each corpus vector a cell; the SPHERE RESIDUAL
    (unit vector minus unit cell centroid) is product-quantized with
    ``normalize=False`` codebooks; a query probes its ``n_probe``
    nearest cells and ADC-scores only rows in those cells as
    est_dot = q·ĉ(cell) + Σ_s lut[s, code_s]; the global ADC top
    ``rerank`` (default 8·k — measured: the true neighbor sits at ADC
    rank <= 2 on this corpus, so 8·k is a wide margin) are rescored
    with the exact cosine and cut to the final k. Rank and reported
    sim come from the rescore.

    Scale shape: the scan side is (id, cell, m bytes); centroids,
    codebooks, query LUTs are broadcast numpy in the Arrow closure;
    rows outside the probed cells are skipped INSIDE the batch (on a
    cluster the codes table is written partitioned by cell, turning
    the skip into partition pruning); the shuffle carries at most
    (partitions x Q x rerank) candidates."""
    rerank = rerank or 8 * k
    if centroids is None:
        centroids = ivf_centroids_kmeans(
            corpus, n_cells, id_col, vec_col
        )
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    c_assign = _ivf_cell_udf(centroids, 1)

    def residual_udf():
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def residual(vecs: pd.Series, cell: pd.Series) -> pd.Series:
            mat = np.asarray(vecs.tolist(), dtype=np.float64)
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            out = mat - cn[cell.to_numpy()]
            return pd.Series(list(out))

        return residual

    with_cell = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("cell"),
    )
    residuals = with_cell.select(
        id_col, "cell", residual_udf()(F.col(vec_col), F.col("cell")).alias("res")
    )
    codebooks = pq_codebooks(
        residuals, m, n_codes, id_col, "res", normalize=False
    )
    sub = codebooks.shape[2]
    codes_df = residuals.select(
        id_col,
        "cell",
        _pq_assign_udf(codebooks, normalize=False)(F.col("res")).alias(
            "codes"
        ),
    )

    q_rows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    q_mat = q_mat / np.maximum(
        np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12
    )
    lut = np.einsum(
        "qsd,skd->qsk", q_mat.reshape(len(q_ids), m, sub), codebooks
    )
    coarse = q_mat @ cn.T  # (Q, n_cells): q·ĉ per cell
    probed = np.argsort(-coarse, axis=1)[:, :n_probe]  # (Q, n_probe)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)
            cell = pdf["cell"].to_numpy()
            ids = pdf[id_col].to_numpy()
            frames = []
            for qi, qid in enumerate(q_ids):
                mask = np.isin(cell, probed[qi])
                if not mask.any():
                    continue
                est = coarse[qi, cell[mask]] + lut[
                    qi, np.arange(m), codes[mask]
                ].sum(axis=1)
                top = min(rerank, est.shape[0])
                idx = np.argpartition(-est, top - 1)[:top]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[mask][idx],
                            "adc": est[idx],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cand = codes_df.mapInPandas(
        scan, "query_id long, neighbor_id long, adc double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    winners = (
        cand.withColumn("rk", F.row_number().over(w_adc))
        .filter(F.col("rk") <= rerank)
        .drop("rk", "adc")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    rescored = (
        winners.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w_exact))
        .filter(F.col("rank") <= k)
    )


def hard_negative_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dup_threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive hard-negative mining: per query, the top-k most
    similar corpus vectors whose cosine stays BELOW ``dup_threshold`` —
    close enough to be informative negatives for a CLIP/retrieval
    training batch, but provably not near-duplicates (those would be
    false negatives that poison the contrastive loss; the threshold is
    the same 0.95 the dedup pipeline uses, so the two stages partition
    the similarity range between them).

    Scale shape: identical to ``cosine_topk`` — broadcast the small
    query set, one corpus scan, per-partition partial top-k under the
    window; the dup cut is applied BEFORE ranking so dropped duplicates
    never occupy rank slots. For corpus-scale query sets swap the scan
    for the IVF/LSH candidate generators (ivf_topk / lsh_bucketed_topk)
    and apply the same ``cos_sim < dup_threshold`` filter before the
    rerank window — the contract is unchanged.

    Output: (query_id, negative_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("negative_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("negative_id"))
        .select(
            "query_id",
            "negative_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") < dup_threshold)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "negative_id", "cos_sim", F.col("rk").alias("rank")
        )
    )


def truncated_recall_audit(
    queries: DataFrame,
    corpus: DataFrame,
    dims: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dimension-truncation recall audit (the Matryoshka/MRL question:
    how much ANN quality survives keeping only the first ``dims`` of
    the embedding?): exact top-k under the FULL vectors vs exact top-k
    under the ``dims``-prefix vectors, reporting per-query overlap and
    recall@k. The capacity-planning probe you run BEFORE committing a
    100 TB corpus to a truncated index — truncation cuts index bytes
    and ADC work linearly, and this measures what it costs in recall
    (composes with quantize_embeddings, which audits the precision
    axis the same way).

    Both rankings use the same rounded-cosine + id tie-break as
    cosine_topk, so the two sets are deterministic and the SQL oracle
    replays them exactly. Scale shape: two broadcast-query corpus
    scans + one tiny per-query join; the prefix slice is a map-side
    array op, never a reshuffle.

    Output: (query_id, n_overlap, recall) — recall rounded 6 dp."""
    full = cosine_topk(queries, corpus, k=k, id_col=id_col, vec_col=vec_col)
    tq = queries.select(
        F.col(id_col), F.slice(vec_col, 1, dims).alias(vec_col)
    )
    tc = corpus.select(
        F.col(id_col), F.slice(vec_col, 1, dims).alias(vec_col)
    )
    trunc = cosine_topk(tq, tc, k=k, id_col=id_col, vec_col=vec_col)
    overlap = (
        full.select("query_id", "neighbor_id")
        .join(trunc.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_overlap"))
    )
    return (
        full.select("query_id")
        .distinct()
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(F.coalesce("n_overlap", F.lit(0)) / k, 6).alias("recall"),
        )
    )


def paired_cosine_filter(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    threshold: float = 0.2,
) -> DataFrame:
    """CLIP-score-style alignment gate (the LAION/DataComp curation
    rule: keep an image+caption pair only if the cosine between its
    image embedding and its text embedding clears a threshold). The
    input is the already-paired frame — one row per example with both
    vectors — so the gate is a PURE MAP: `zip_with` dot product +
    norms per row, zero shuffles, zero Python; at 100 TB it rides the
    scan. Adds ``align_cos`` (rounded 6 dp, the SQL-replayable value)
    and ``keep``."""
    a = F.col(left_col)
    b = F.col(right_col)
    cos = F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)
    return pairs.withColumn("align_cos", cos).withColumn(
        "keep", F.col("align_cos") >= threshold
    )


def embedding_outliers(
    emb: DataFrame,
    z_threshold: float = 2.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space outlier detection (the corpus-cleaning pass that
    drops mis-embedded / off-manifold rows before ANN indexing or
    semantic dedup): distance to the corpus centroid, z-scored against
    the corpus distance distribution, flag z >= threshold.

    Scale shape: two corpus scans, ZERO corpus-keyed shuffles — pass 1
    aggregates per-dimension sums (posexplode + groupBy(dim): dim-
    bounded output with map-side partials, collected like pca_fit's
    d x d Gram — 64 doubles, never corpus data); pass 2 computes each
    row's distance map-side via a zip_with fold against the literal
    centroid; the mean/stddev normalizer is a 1-row broadcast. All
    intermediate values round to 6 dp so the DuckDB oracle replays the
    arithmetic despite aggregation-order ulps."""
    flat = emb.select(F.col(id_col), F.posexplode(vec_col).alias("i", "v"))
    cent_rows = (
        flat.groupBy("i").agg(F.round(F.avg("v"), 6).alias("c")).collect()
    )
    cent = [r["c"] for r in sorted(cent_rows, key=lambda r: r["i"])]
    carr = F.array(*[F.lit(float(c)) for c in cent])
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col).cast("array<double>"),
                    carr,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        6,
    )
    d = emb.select(F.col(id_col), dist.alias("dist"))
    stats = d.agg(
        F.round(F.avg("dist"), 6).alias("_mu"),
        F.round(F.stddev_pop("dist"), 6).alias("_sd"),
    )
    return (
        d.crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "dist",
            F.round(
                (F.col("dist") - F.col("_mu")) / F.col("_sd"), 4
            ).alias("z"),
        )
        .withColumn("outlier", F.col("z") >= z_threshold)
    )
