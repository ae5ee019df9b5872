"""MinHash + LSH near-duplicate detection and SimHash fingerprints for
text — the scale path for deduplication (shingle → minhash → band →
bucket-join), plus the same machinery the modeler's C3 schema-distance
merge uses on XPath sets.

All signature computation is vectorized numpy inside Arrow-batched
``mapInPandas`` (hashing millions of shingles per batch); the candidate
join and verification are native DataFrame ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1


def _hash_perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(tokens: list, n: int) -> np.ndarray:
    """Stable 64-bit hashes of n-gram shingles, vectorized: pandas'
    ``hash_array`` (C-level SipHash with a fixed key) over the joined
    shingle strings — ~50× the per-character Python FNV loop it
    replaced. Any stable 64-bit hash family works here: signatures only
    need consistency within a run + uniformity."""
    if len(tokens) < n:
        shingles = [" ".join(tokens)] if tokens else []
    else:
        shingles = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(shingles, dtype=object)).astype(np.uint64)


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 64,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 13,
) -> DataFrame:
    """(id, sig array<long>) — one minhash per permutation."""
    a_params, b_params = _hash_perm_params(num_perm, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # ONE hash_array call over the whole Arrow batch's shingles
            # (per-doc calls pay pandas' per-call overhead ~n_docs times)
            all_sh: list = []
            bounds = [0]
            for text in pdf[text_col].astype(str):
                toks = _tokenize(text)
                if len(toks) < shingle_n:
                    sh = [" ".join(toks)] if toks else []
                else:
                    sh = [
                        " ".join(toks[i : i + shingle_n])
                        for i in range(len(toks) - shingle_n + 1)
                    ]
                all_sh.extend(sh)
                bounds.append(len(all_sh))
            hashes = (
                pd.util.hash_array(np.asarray(all_sh, dtype=object)).astype(
                    np.uint64
                )
                if all_sh
                else np.empty(0, dtype=np.uint64)
            )
            sigs = []
            for j in range(len(bounds) - 1):
                sh = hashes[bounds[j] : bounds[j + 1]]
                if len(sh) == 0:
                    sigs.append(
                        np.full(num_perm, _MERSENNE, dtype=np.int64).tolist()
                    )
                    continue
                # (num_perm, n_shingles) universal hashing, min over shingles
                vals = (
                    a_params[:, None] * sh[None, :] + b_params[:, None]
                ) % np.uint64(_MERSENNE)
                sigs.append(vals.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, sig array<long>"
    )


def _tokenize(text: str) -> list:
    import re

    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def shingle_set(text_col, n: int = 3):
    """Distinct n-gram shingles of a text column as a native array
    expression (JVM-side, no Python) — the EXACT similarity domain the
    minhash signatures approximate, so LSH-candidate + this-verify is a
    consistent pipeline. Mirrors _shingle_hashes: texts with fewer than
    ``n`` tokens collapse to the single joined-token shingle."""
    toks = F.filter(
        F.split(F.lower(text_col), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    n_t = F.size(toks)
    # greatest() keeps the sequence ascending (and element_at >= 1) on the
    # short-text rows where this branch's value is discarded by the when()
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(n_t - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(n_t >= n, F.array_distinct(tri)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def band_buckets(
    signatures: DataFrame,
    bands: int,
    id_col: str = "doc_id",
    num_perm: int | None = None,
) -> DataFrame:
    """(id, band, bucket) — one row per band, bucket = hash of the
    band's signature slice. This IS the stored LSH index layout: at
    production scale it is written once per corpus snapshot (bucketed
    by (band, bucket)) and probed by every incremental batch."""
    if num_perm is None:
        num_perm = len(signatures.select("sig").first()[0])
    rows_per_band = num_perm // bands
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int,
    id_col: str = "doc_id",
    num_perm: int | None = None,
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing >=1 band
    bucket. The join key is (band, hash(band slice)) — a shuffle
    equi-join; the pair explosion is bounded by bucket sizes, and the
    groupBy dedups multi-band collisions. Pass ``num_perm`` when known —
    inferring it costs an extra job (and a full signature computation)."""
    banded = band_buckets(signatures, bands, id_col, num_perm)
    left = banded.select(
        F.col(id_col).alias("id_a"), "band", "bucket"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), "band", "bucket"
    )
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates verified by exact shingle-set Jaccard >= threshold.

    End-to-end: shingle+minhash (Arrow UDF) → band bucket join →
    verification join back to the exact distinct-shingle sets → exact
    filter. Verification uses the SAME similarity domain the signatures
    approximate (n-gram shingle Jaccard), so the output is exactly the
    true near-dup pair set wherever the banding's recall holds — which
    makes it brute-force-oracle-checkable. At 100 TB the cross join
    never happens; cost is dominated by the two shuffles on
    (band, bucket) and id.
    """
    # the signature UDF feeds both sides of the bucket self-join —
    # materialize so Arrow hashing runs once (at 100 TB: a materialized
    # signatures table). localCheckpoint, NOT persist: cached plans stay
    # pinned in the CacheManager until an explicit unpersist (a leak in
    # long-lived sessions calling this per corpus), while checkpointed
    # RDDs are GC'd with the DataFrame
    sigs = minhash_signatures(
        docs, num_perm, shingle_n, text_col, id_col
    ).localCheckpoint(eager=True)
    cand = lsh_candidate_pairs(sigs, bands, id_col, num_perm=num_perm)
    ws = docs.select(F.col(id_col), shingle_set(text_col, shingle_n).alias("ws"))
    pairs = (
        cand.join(ws.select(F.col(id_col).alias("id_a"), F.col("ws").alias("ws_a")), "id_a")
        .join(ws.select(F.col(id_col).alias("id_b"), F.col("ws").alias("ws_b")), "id_b")
    )
    inter = F.size(F.array_intersect("ws_a", "ws_b"))
    union = F.size(F.array_union("ws_a", "ws_b"))
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return pairs.select(
        "id_a", "id_b", F.round(sim, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def incremental_near_dup(
    corpus: DataFrame,
    batch: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Dedup an incoming batch AGAINST an existing corpus — the shape a
    continuously-ingesting training-data pipeline actually runs: the
    corpus LSH index is built once per snapshot (``band_buckets``
    layout, stored bucketed by (band, bucket)) and each new batch
    probes it, so per-batch cost scales with the batch, never with a
    corpus × corpus pair join. Pass ``corpus_index`` to probe a stored
    index instead of recomputing signatures (the production path — see
    test_incremental_dedup.py for the no-Exchange bucketed probe pin).

    Candidates come from the (band, bucket) equi-join of batch buckets
    against corpus buckets — ids only through the shuffle; each side's
    exact shingle sets are joined back once for verification, the same
    id-only discipline as minhash_near_dup_pairs. Every batch row is
    returned: (id, is_dup, dup_of, jaccard) where dup_of is the
    best-matching corpus doc (highest exact Jaccard >= threshold,
    ties to the smallest corpus id) and null when the batch doc is
    novel. Best-match selection is a groupBy max(struct) — map-side
    combinable, no window over the candidate set.
    """
    if corpus_index is None:
        corpus_index = band_buckets(
            minhash_signatures(corpus, num_perm, shingle_n, text_col, id_col),
            bands,
            id_col,
            num_perm,
        )
    batch_index = band_buckets(
        minhash_signatures(batch, num_perm, shingle_n, text_col, id_col),
        bands,
        id_col,
        num_perm,
    )
    cand = (
        batch_index.select(F.col(id_col).alias("_bid"), "band", "bucket")
        .join(
            corpus_index.select(F.col(id_col).alias("dup_of"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("_bid", "dup_of")
        .distinct()
    )
    b_ws = batch.select(
        F.col(id_col).alias("_bid"), shingle_set(text_col, shingle_n).alias("ws_b")
    )
    c_ws = corpus.select(
        F.col(id_col).alias("dup_of"),
        shingle_set(text_col, shingle_n).alias("ws_c"),
    )
    inter = F.size(F.array_intersect("ws_b", "ws_c"))
    union = F.size(F.array_union("ws_b", "ws_c"))
    sim = F.round(
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6
    )
    verified = (
        cand.join(b_ws, "_bid")
        .join(c_ws, "dup_of")
        .select("_bid", "dup_of", sim.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    best = (
        verified.groupBy("_bid")
        .agg(F.max(F.struct(F.col("jaccard"), (-F.col("dup_of")).alias("_neg"))).alias("m"))
        .select(
            "_bid",
            (-F.col("m._neg")).alias("dup_of"),
            F.col("m.jaccard").alias("jaccard"),
        )
    )
    return (
        batch.select(F.col(id_col).alias("_bid"))
        .join(best, "_bid", "left")
        .select(
            F.col("_bid").alias(id_col),
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            "jaccard",
        )
    )


def _md5_token_hash(token: str) -> int:
    """Stable 64-bit token hash = first 16 hex chars of md5, as uint64.

    Chosen over SipHash because it is reproducible by any SQL engine
    (DuckDB: ``('0x' || substr(md5(t), 1, 16))::UBIGINT``) — that makes
    the whole SimHash pipeline oracle-checkable end-to-end. Computed
    once per *distinct* vocabulary term (cached), never per occurrence,
    so the hot path stays vectorized numpy."""
    import hashlib

    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:16], 16)


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over word tokens (vectorized numpy in mapInPandas):
    md5-derived per-token hash (see _md5_token_hash — SQL-reproducible),
    bit-majority vote weighted by term frequency; votes==0 → bit 0."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab: dict[str, int] = {}
        shifts = np.arange(64, dtype=np.uint64)
        weights = np.uint64(1) << shifts

        def h64(tok: str) -> int:
            v = vocab.get(tok)
            if v is None:
                v = vocab[tok] = _md5_token_hash(tok)
            return v

        for pdf in batches:
            out = []
            for text in pdf[text_col].astype(str):
                toks = _tokenize(text)
                if not toks:
                    out.append(0)
                    continue
                uniq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
                hs = np.fromiter(
                    (h64(t) for t in uniq), dtype=np.uint64, count=len(uniq)
                )
                bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                    np.int64
                )
                votes = ((2 * bits - 1) * cnt[:, None]).sum(axis=0)
                h = (weights[votes > 0]).sum(dtype=np.uint64)
                out.append(int(h.astype(np.int64)))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, simhash long"
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup: block-LSH candidates with guaranteed recall
    (max_hamming+1 blocks ⇒ any pair within the distance shares >=1
    identical block, pigeonhole), verified by popcount of xor."""
    from smart_crawler_spark.operators.images import _hamming_blocks

    # localCheckpoint, not persist — see minhash_near_dup_pairs
    sh = simhash64(docs, text_col, id_col).localCheckpoint(eager=True)
    blocks = sh.select(
        F.col(id_col),
        "simhash",
        F.explode(F.array(*_hamming_blocks("simhash", max_hamming))).alias("bk"),
    ).select(id_col, "simhash", "bk.block", "bk.key")
    left = blocks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "block", "key"
    )
    right = blocks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "block", "key"
    )
    cand = (
        left.join(right, ["block", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
