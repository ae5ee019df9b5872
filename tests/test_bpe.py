"""Differential tests: Spark BPE trainer/encoder vs a pure-Python
reference implementation of Sennrich-style BPE."""

from __future__ import annotations

import collections
import re

import pytest

from smart_crawler_spark.operators.textops import (
    bpe_encode,
    bpe_pair_stats,
    bpe_train,
)

END = "</w>"


def _py_words(texts):
    wf = collections.Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                wf[w] += 1
    return wf


def _py_merge(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(texts, num_merges, min_weight=2):
    vocab = {
        w: (list(w) + [END], f) for w, f in _py_words(texts).items()
    }
    merges = []
    for _ in range(num_merges):
        pc = collections.Counter()
        for syms, f in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), wgt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if wgt < min_weight:
            break
        merges.append((left, right, wgt))
        vocab = {
            k: (_py_merge(s, left, right), f) for k, (s, f) in vocab.items()
        }
    return merges


def _py_encode(text, merges):
    toks = []
    for w in re.split(r"[^a-z0-9]+", text.lower()):
        if not w:
            continue
        syms = list(w) + [END]
        for left, right, *_ in merges:
            syms = _py_merge(syms, left, right)
        toks.extend(syms)
    return toks


TEXTS = [
    "the cat sat on the mat",
    "the cats chatter and the mat sags",
    "low lower lowest newer newest wider wide",
    "ban banana bandana the the the cat",
    "aaaa aaaa aa a baa",
]


def test_bpe_train_matches_python(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe_train(docs, num_merges=15)
    want = _py_train(TEXTS, num_merges=15)
    assert got == want
    assert len(got) > 5  # the corpus actually trains


def test_bpe_encode_matches_python(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = _py_train(TEXTS, num_merges=12)
    out = bpe_encode(docs, merges, checkpoint_every=5).collect()
    by_doc = collections.defaultdict(list)
    for r in sorted(out, key=lambda r: (r["doc_id"], r["pos"])):
        by_doc[r["doc_id"]].append(r["token"])
    for i, t in enumerate(TEXTS):
        assert by_doc[i] == _py_encode(t, merges), f"doc {i}"
    # positions are dense per doc
    for i in by_doc:
        assert [r["pos"] for r in sorted(out, key=lambda r: r["pos"]) if r["doc_id"] == i] == list(range(len(by_doc[i])))


def test_bpe_pair_stats_hand_case(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab abc"), (1, "xy")], "doc_id long, text string"
    )
    rows = {r["pair"]: r["weight"] for r in bpe_pair_stats(docs).collect()}
    assert rows == {"a b": 3, "b c": 1, "x y": 1}


def test_bpe_train_min_weight_stops(spark):
    docs = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    # every pair occurs once -> below min_weight=2 -> no merges
    assert bpe_train(docs, num_merges=5) == []


@pytest.mark.parametrize("word,merge,want", [
    ("aaaa", ("a", "a"), ["aa", "aa", END]),
    ("aaa", ("a", "a"), ["aa", "a", END]),
    ("abab", ("a", "b"), ["ab", "ab", END]),
])
def test_merge_pass_semantics(spark, word, merge, want):
    docs = spark.createDataFrame([(0, word)], "doc_id long, text string")
    out = bpe_encode(docs, [merge]).collect()
    assert [r["token"] for r in sorted(out, key=lambda r: r["pos"])] == want


def _rand_texts(seed: int, n: int = 12) -> list[str]:
    import random

    rng = random.Random(seed)
    alpha = "abcdefg"
    out = []
    for _ in range(n):
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 10))
        ]
        out.append(" ".join(words))
    return out


@pytest.mark.parametrize("seed,batch", [(1, 4), (7, 8), (42, 5), (99, 16)])
def test_bpe_train_batched_identical(spark, seed, batch):
    """Batched merges (batch_merges=m) must emit the IDENTICAL merge
    list as the sequential trainer / the pure-Python reference, in
    fewer driver rounds — the prefix-safe batching rule with the
    strict stop-weight cutoff and the concat-collision guards."""
    texts = _rand_texts(seed)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = _py_train(texts, num_merges=20)
    st_b: dict = {}
    got_b = bpe_train(docs, num_merges=20, batch_merges=batch, stats=st_b)
    assert got_b == want
    # never MORE rounds than sequential; conflict-heavy stretches (all
    # the early merges pair with </w>, sharing that symbol) legally
    # degrade to one merge per round — the compression itself is
    # pinned on the fixture corpus below
    assert st_b["rounds"] <= max(len(want), 1)


def test_bpe_train_batched_on_fixture_corpus(spark):
    """The hand fixture corpus: batched == sequential == python, with
    a round-count reduction, and stats reporting on both paths."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    st_seq: dict = {}
    st_bat: dict = {}
    seq = bpe_train(docs, num_merges=15, stats=st_seq)
    bat = bpe_train(docs, num_merges=15, batch_merges=6, stats=st_bat)
    assert seq == bat == _py_train(TEXTS, num_merges=15)
    assert st_seq["rounds"] >= len(seq)
    assert st_bat["rounds"] < st_seq["rounds"]


def test_bpe_train_batch_validation(spark):
    docs = spark.createDataFrame([(0, "aa bb")], "doc_id long, text string")
    with pytest.raises(ValueError, match="batch_merges"):
        bpe_train(docs, batch_merges=0)
