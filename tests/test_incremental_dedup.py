"""Incremental batch-vs-corpus near-dup (operators/minhash.py
incremental_near_dup): the continuous-ingest dedup shape — a stored
corpus LSH index probed by each incoming batch, per-batch cost
independent of corpus-pair count. Correctness on planted cases, plan
pins (no cartesian; bucketed stored index probed without a corpus-side
Exchange), and stored-index == inline-index equivalence."""

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.operators import minhash


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


CORPUS = [
    (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    # exact duplicate of doc 1 inside the corpus — exercises the
    # best-match tie-break (jaccard equal -> smallest corpus id)
    (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (3, "kilo lima mike november oscar papa quebec romeo sierra tango uniform victor"),
    (4, "whiskey xray yankee zulu one two three four five six seven"),
]

BATCH = [
    # exact copy of corpus 1/2 -> dup, jaccard 1.0, dup_of = 1 (min id)
    (101, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    # novel text -> not a dup
    (102, "red orange yellow green blue indigo violet amber teal maroon"),
    # corpus 3 with the last word dropped: 9 of 10 trigrams shared
    (103, "kilo lima mike november oscar papa quebec romeo sierra tango uniform"),
]


@pytest.fixture(scope="module")
def result(spark):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    batch = spark.createDataFrame(BATCH, ["doc_id", "text"])
    out = minhash.incremental_near_dup(corpus, batch, threshold=0.8)
    return {r["doc_id"]: r for r in out.collect()}


def test_every_batch_row_returned(result):
    assert set(result) == {101, 102, 103}


def test_exact_copy_flagged_with_min_id_tiebreak(result):
    r = result[101]
    assert r["is_dup"] and r["dup_of"] == 1 and r["jaccard"] == 1.0


def test_novel_doc_not_flagged(result):
    r = result[102]
    assert not r["is_dup"] and r["dup_of"] is None and r["jaccard"] is None


def test_near_copy_flagged_with_exact_jaccard(result):
    r = result[103]
    assert r["is_dup"] and r["dup_of"] == 3
    assert r["jaccard"] == 0.9  # 9 shared / 10 union trigrams


def test_plan_has_no_cartesian(spark):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    batch = spark.createDataFrame(BATCH, ["doc_id", "text"])
    plan = _plan(minhash.incremental_near_dup(corpus, batch))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


@pytest.fixture(scope="module")
def stored_index(spark, tmp_path_factory):
    """The production layout: corpus band buckets persisted bucketed by
    (band, bucket) — the probe join's exact key."""
    from smart_crawler_spark.sources.bucketed import write_bucketed

    loc = str(tmp_path_factory.mktemp("lsh_wh"))
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = minhash.band_buckets(
        minhash.minhash_signatures(corpus), bands=16, num_perm=64
    )
    t = write_bucketed(
        idx, "lsh_index", key=["band", "bucket"], n_buckets=8,
        database="lshdb", location=loc,
    )
    yield t
    spark.sql("DROP TABLE IF EXISTS lshdb.lsh_index")
    spark.sql("DROP DATABASE IF EXISTS lshdb")


def test_stored_index_probe_skips_corpus_shuffle(spark, stored_index):
    """Probing the bucketed index shuffles ONLY the batch side: one
    Exchange (batch) vs two in the unbucketed control. At 10^10 corpus
    rows that is the difference between reshuffling the corpus index
    every batch and never."""
    idx = spark.table(stored_index)
    batch = spark.createDataFrame(BATCH, ["doc_id", "text"])
    b_idx = minhash.band_buckets(
        minhash.minhash_signatures(batch), bands=16, num_perm=64
    ).withColumnRenamed("doc_id", "batch_id")
    probe = b_idx.hint("merge").join(idx, ["band", "bucket"])
    control = b_idx.hint("merge").join(
        idx.localCheckpoint(eager=True), ["band", "bucket"]
    )
    n_bucketed = _plan(probe).count("Exchange")
    n_control = _plan(control).count("Exchange")
    assert n_bucketed < n_control, (n_bucketed, n_control)
    assert n_bucketed == 1, _plan(probe)


def _brute_force(corpus, batch, threshold):
    """Pure-Python spec: exact shingle Jaccard vs every corpus doc,
    best = (max round-6 jaccard, min corpus id)."""
    import re

    def shingles(text):
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        if len(toks) < 3:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    c_sh = {cid: shingles(t) for cid, t in corpus}
    out = {}
    for bid, t in batch:
        s = shingles(t)
        best = None
        for cid, cs in c_sh.items():
            union = len(s | cs)
            j = round(len(s & cs) / union, 6) if union else 0.0
            if j >= threshold and (
                best is None or (j, -cid) > (best[1], -best[0])
            ):
                best = (cid, j)
        out[bid] = best
    return out


def test_random_sweep_matches_brute_force(spark):
    """Randomized corpora/batches: exact copies, truncated near-copies
    (J >= ~0.8), and novel docs — engine output == the pure-Python spec
    on every shape. Threshold 0.6 keeps every planted pair far from
    both the decision boundary and the 16x4 banding recall cliff."""
    import random

    vocab = [f"w{i}" for i in range(60)]
    for seed in range(5):
        rng = random.Random(seed)
        n_c = rng.randrange(25, 50)
        corpus = [
            (cid, " ".join(rng.choices(vocab, k=rng.randrange(8, 40))))
            for cid in range(n_c)
        ]
        batch = []
        for bid in range(100, 100 + rng.randrange(12, 25)):
            kind = rng.randrange(3)
            if kind == 0:  # exact copy
                batch.append((bid, corpus[rng.randrange(n_c)][1]))
            elif kind == 1:  # drop the last ~10% of a long-enough doc
                src = rng.choice([c for c in corpus if len(c[1].split()) >= 20])
                toks = src[1].split()
                batch.append((bid, " ".join(toks[: len(toks) - 2])))
            else:  # novel
                batch.append(
                    (bid, " ".join(rng.choices(vocab, k=rng.randrange(8, 40))))
                )
        got = {
            r["doc_id"]: (r["dup_of"], r["jaccard"])
            for r in minhash.incremental_near_dup(
                spark.createDataFrame(corpus, ["doc_id", "text"]),
                spark.createDataFrame(batch, ["doc_id", "text"]),
                threshold=0.6,
            ).collect()
            if r["is_dup"]
        }
        want = {
            bid: b
            for bid, b in _brute_force(corpus, batch, 0.6).items()
            if b is not None
        }
        assert got == want, (seed, got, want)


def test_stored_index_matches_inline(spark, stored_index):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    batch = spark.createDataFrame(BATCH, ["doc_id", "text"])
    inline = minhash.incremental_near_dup(corpus, batch)
    stored = minhash.incremental_near_dup(
        corpus, batch, corpus_index=spark.table(stored_index)
    )
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(inline.collect(), key=key) == sorted(
        stored.collect(), key=key
    )


# ---------------------------------------------------------------- images


def test_incremental_image_dedup_cycle_and_stored_index(spark):
    """The image twin (operators/images.py incremental_image_dedup):
    exact re-crawls and cross-codec re-encodes flag against their
    corpus original, novel rows stay clean; probing a precomputed
    index returns identical verdicts."""
    from smart_crawler_spark.datagen.images import (
        generate_images,
        generate_ingest_batch,
    )
    from smart_crawler_spark.operators.images import (
        incremental_image_dedup,
        joint_block_index,
    )

    corpus = generate_images(spark, 60, jpeg_every=10)
    batch = generate_ingest_batch(spark, 30, jpeg_every=10)
    got = {
        r["image_id"]: (r["is_dup"], r["dup_of"])
        for r in incremental_image_dedup(
            corpus, batch, max_hamming=9
        ).collect()
    }
    assert len(got) == 30
    for j in range(30):
        want = (True, f"img{j}") if j % 4 < 3 else (False, None)
        assert got[f"new{j}"] == want, j
    # cross-codec rows really did change format (perceptual-only match)
    fmts = {
        r["image_id"]: r["fmt"]
        for r in batch.select("image_id", "fmt").collect()
    }
    corpus_fmts = {
        r["image_id"]: r["fmt"]
        for r in corpus.select("image_id", "fmt").collect()
    }
    recoded = [j for j in range(30) if j % 4 == 1]
    assert all(fmts[f"new{j}"] != corpus_fmts[f"img{j}"] for j in recoded)
    # thumbnail rows really are half-size (perceptual-only matches)
    dims = {
        r["image_id"]: (r["w"], r["h"])
        for r in batch.select("image_id", "w", "h").collect()
    }
    corpus_dims = {
        r["image_id"]: (r["w"], r["h"])
        for r in corpus.select("image_id", "w", "h").collect()
    }
    for j in range(30):
        if j % 4 == 2:
            cw, ch = corpus_dims[f"img{j}"]
            assert dims[f"new{j}"] == (cw // 2, ch // 2), j

    stored = joint_block_index(corpus, max_hamming=9)
    got2 = {
        r["image_id"]: (r["is_dup"], r["dup_of"])
        for r in incremental_image_dedup(
            corpus, batch, max_hamming=9, corpus_index=stored
        ).collect()
    }
    assert got2 == got
    # candidate join ships ids+hashes only, never payload bytes
    plan = (
        incremental_image_dedup(corpus, batch)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
