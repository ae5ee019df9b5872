"""Golden / differential tests for the late round-4 operators:
FastSS edit-distance fuzzy join, bigram-PMI collocations, and
reciprocal-rank fusion."""

from __future__ import annotations

import math
import random
from collections import Counter

from pyspark.sql import functions as F

from smart_crawler_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_self_join,
)
from smart_crawler_spark.operators.textops import pmi_collocations, rrf_fuse


# ----------------------------------------------------------------- fuzzy


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_deletion_variants_golden(spark):
    row = spark.range(1).select(
        deletion_variants(F.lit("abc"), 1).alias("v1"),
        deletion_variants(F.lit("abc"), 2).alias("v2"),
        deletion_variants(F.lit(""), 1).alias("v0"),
    ).first()
    assert sorted(row["v1"]) == ["ab", "abc", "ac", "bc"]
    # d=2 adds all single chars (deleting two of three)
    assert sorted(row["v2"]) == ["a", "ab", "abc", "ac", "b", "bc", "c"]
    assert row["v0"] == [""]


def test_fuzzy_self_join_matches_bruteforce(spark):
    rng = random.Random(41)
    alpha = "abcdef"
    keys = {}
    i = 0
    while len(keys) < 80:
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 9)))
        if s not in keys.values():
            keys[i] = s
            i += 1
    df = spark.createDataFrame(
        [(k, v) for k, v in keys.items()], "id long, key string"
    )
    for d in (1, 2):
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in fuzzy_self_join(df, "key", "id", max_dist=d).collect()
        }
        want = {
            (a, b): _lev(keys[a], keys[b])
            for a in keys
            for b in keys
            if a < b and _lev(keys[a], keys[b]) <= d
        }
        assert got == want, f"mismatch at d={d}"


def test_fuzzy_join_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "xyz")], "id long, key string"
    )
    plan = fuzzy_self_join(df, "key", "id")._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ------------------------------------------------------------------- pmi


def test_pmi_collocations_golden(spark):
    # "new york" appears 5x; tokens: new=6 (one stray), york=5,
    # and filler words. PMI replayed by hand from the counts.
    docs = spark.createDataFrame(
        [
            (1, "new york new york new york is big"),
            (2, "new york new york and new jersey"),
        ],
        "doc_id long, text string",
    )
    rows = pmi_collocations(docs, min_count=5).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert set(got) == {("new", "york")}
    r = got[("new", "york")]
    assert r["pair_count"] == 5
    words1 = "new york new york new york is big".split()
    words2 = "new york new york and new jersey".split()
    n = float(len(words1) + len(words2))
    b = float((len(words1) - 1) + (len(words2) - 1))
    cx = float(Counter(words1 + words2)["new"])
    cy = float(Counter(words1 + words2)["york"])
    want = round(math.log((5.0 * n * n) / (b * cx * cy)), 6)
    assert abs(r["pmi"] - want) < 1e-9


def test_pmi_no_cross_document_bigrams(spark):
    # "a b" never co-occurs within a doc; doc boundary must not leak
    docs = spark.createDataFrame(
        [(1, "a a a a a"), (2, "b b b b b")], "doc_id long, text string"
    )
    rows = pmi_collocations(docs, min_count=1).collect()
    pairs = {(r["w1"], r["w2"]) for r in rows}
    assert ("a", "b") not in pairs and ("b", "a") not in pairs
    assert ("a", "a") in pairs and ("b", "b") in pairs


# ------------------------------------------------------------------- rrf


def test_rrf_fuse_golden(spark):
    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(11, 1), (13, 2)], "doc_id long, rank int"
    )
    got = {r["id"]: r for r in rrf_fuse(a, b, topn=10).collect()}
    # 11 is in both lists -> top fused
    assert got[11]["fused_rank"] == 1
    assert got[11]["rank_a"] == 2 and got[11]["rank_b"] == 1
    assert abs(got[11]["rrf_score"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    # single-list ids carry rank 0 on the missing side
    assert got[10]["rank_b"] == 0
    assert abs(got[10]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    assert got[13]["rank_a"] == 0
    # fused order: 11 (both), then 10 (rank1 in a), 13, 12
    order = sorted(got.values(), key=lambda r: r["fused_rank"])
    assert [r["id"] for r in order] == [11, 10, 13, 12]


def test_rrf_topn_and_ties(spark):
    # identical scores tie-break on ascending id, topn truncates
    a = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_id long, rank int"
    )
    out = rrf_fuse(a, a, topn=5).collect()
    assert [r["id"] for r in out] == [0, 1, 2, 3, 4]
    assert [r["fused_rank"] for r in out] == [1, 2, 3, 4, 5]
