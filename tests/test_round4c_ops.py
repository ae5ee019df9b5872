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


# ----------------------------------------------------------- evalmetrics


def _auc_brute(pairs):
    """Tie-aware AUC by definition: mean over (pos, neg) pairs of
    win=1 / tie=0.5 / loss=0."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    tot = 0.0
    for p in pos:
        for n in neg:
            tot += 1.0 if p > n else (0.5 if p == n else 0.0)
    return tot / (len(pos) * len(neg))


def test_roc_auc_golden_and_ties(spark):
    from smart_crawler_spark.operators.evalmetrics import roc_auc

    cases = [
        # wins 2 (0.9 beats both negs), loss 1, tie 0.5 -> 0.625
        [(0.9, True), (0.8, False), (0.7, True), (0.7, False)],
        # perfect separation
        [(0.9, True), (0.8, True), (0.2, False), (0.1, False)],
        # inverted
        [(0.1, True), (0.2, True), (0.8, False), (0.9, False)],
        # all tied -> 0.5
        [(0.5, True), (0.5, False), (0.5, True), (0.5, False)],
    ]
    for pairs in cases:
        df = spark.createDataFrame(pairs, "score double, label boolean")
        row = roc_auc(df).first()
        assert row["n_pos"] == sum(1 for _, y in pairs if y)
        assert row["n_neg"] == sum(1 for _, y in pairs if not y)
        assert abs(row["auc"] - round(_auc_brute(pairs), 6)) < 1e-9


def test_roc_auc_random_differential(spark):
    from smart_crawler_spark.operators.evalmetrics import roc_auc

    rng = random.Random(7)
    # heavy ties: scores drawn from a 12-value grid, labels correlated
    pairs = [
        (round(rng.randint(0, 11) / 11.0, 6), rng.random() < 0.3 + 0.4 * (rng.randint(0, 11) > 5))
        for _ in range(400)
    ]
    # regenerate with label depending on the SAME score draw
    pairs = []
    for _ in range(400):
        s = round(rng.randint(0, 11) / 11.0, 6)
        pairs.append((s, rng.random() < 0.2 + 0.6 * s))
    if not any(y for _, y in pairs) or all(y for _, y in pairs):
        pairs[0] = (pairs[0][0], True)
        pairs[1] = (pairs[1][0], False)
    df = spark.createDataFrame(pairs, "score double, label boolean")
    got = roc_auc(df).first()["auc"]
    assert abs(got - round(_auc_brute(pairs), 6)) < 1e-9


def test_calibration_bins_golden(spark):
    from smart_crawler_spark.operators.evalmetrics import calibration_bins

    df = spark.createDataFrame(
        [
            (0.05, False),
            (0.15, False),
            (0.15, True),
            (0.95, True),
            (0.95, True),
            (1.0, True),  # score 1.0 clamps into the last bin
        ],
        "score double, label boolean",
    )
    rows = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
    assert set(rows) == {0, 1, 9}
    assert rows[0]["n"] == 1 and rows[0]["pos_rate"] == 0.0
    assert rows[1]["n"] == 2
    assert abs(rows[1]["mean_score"] - 0.15) < 1e-9
    assert abs(rows[1]["pos_rate"] - 0.5) < 1e-9
    assert rows[9]["n"] == 3
    assert abs(rows[9]["mean_score"] - round((0.95 + 0.95 + 1.0) / 3, 6)) < 1e-9
    assert rows[9]["pos_rate"] == 1.0
    assert abs(rows[9]["abs_gap"] - round(1.0 - round(2.9 / 3, 6), 6)) < 1e-9


def test_roc_auc_plan_two_phase(spark):
    """The only unpartitioned window must be over the 64-row bucket
    offsets; the distinct-score window is bucket-partitioned; no
    cartesian; broadcast offset join."""
    from smart_crawler_spark.operators.evalmetrics import roc_auc

    df = spark.createDataFrame(
        [(i / 100.0, i % 3 == 0) for i in range(100)],
        "score double, label boolean",
    )
    plan = roc_auc(df)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Window") >= 2  # in-bucket + offset windows


def test_ndcg_golden(spark):
    from smart_crawler_spark.operators.evalmetrics import ndcg_at_k

    ranked = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "id string, rank int"
    )
    # b has no label (rel 0); d is relevant but unretrieved
    rels = spark.createDataFrame(
        [("a", 3), ("c", 1), ("d", 2)], "id string, rel long"
    )
    row = ndcg_at_k(ranked, rels, k=3).first()
    dcg = (2**3 - 1) / math.log2(2) + 0.0 + (2**1 - 1) / math.log2(4)
    idcg = (
        (2**3 - 1) / math.log2(2)
        + (2**2 - 1) / math.log2(3)
        + (2**1 - 1) / math.log2(4)
    )
    assert abs(row["dcg"] - round(dcg, 6)) < 1e-9
    assert abs(row["idcg"] - round(idcg, 6)) < 1e-9
    assert abs(row["ndcg"] - round(round(dcg, 6) / round(idcg, 6), 6)) < 1e-9


def test_ndcg_perfect_ranking_is_one(spark):
    from smart_crawler_spark.operators.evalmetrics import ndcg_at_k

    rels = spark.createDataFrame(
        [(i, 10 - i) for i in range(10)], "id long, rel long"
    )
    ranked = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id long, rank int"
    )
    assert ndcg_at_k(ranked, rels, k=10, id_col="id").first()["ndcg"] == 1.0


def test_cohens_kappa_golden(spark):
    from smart_crawler_spark.operators.evalmetrics import cohens_kappa

    # classic textbook table: tt=20, tf=5, ft=10, ff=15, n=50
    rows = (
        [(True, True)] * 20
        + [(True, False)] * 5
        + [(False, True)] * 10
        + [(False, False)] * 15
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = cohens_kappa(df).first()
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 2500
    assert r["n"] == 50
    assert abs(r["p_o"] - round(po, 6)) < 1e-9
    assert abs(r["p_e"] - round(pe, 6)) < 1e-9
    assert abs(r["kappa"] - round((po - pe) / (1 - pe), 6)) < 1e-9


def test_cohens_kappa_extremes(spark):
    from smart_crawler_spark.operators.evalmetrics import cohens_kappa

    agree = spark.createDataFrame(
        [(True, True)] * 3 + [(False, False)] * 3, "a boolean, b boolean"
    )
    assert cohens_kappa(agree).first()["kappa"] == 1.0
    # perfect systematic disagreement -> kappa = -1
    disagree = spark.createDataFrame(
        [(True, False)] * 3 + [(False, True)] * 3, "a boolean, b boolean"
    )
    assert cohens_kappa(disagree).first()["kappa"] == -1.0
    # constant raters: p_e = 1 -> kappa undefined (NULL)
    const = spark.createDataFrame(
        [(True, True)] * 4, "a boolean, b boolean"
    )
    assert cohens_kappa(const).first()["kappa"] is None


def test_zipf_fit_golden(spark):
    from smart_crawler_spark.operators.textops import zipf_fit

    # exact power-law corpus: word w_r appears round(64/r) times for
    # r=1..8 -> the ln-ln fit is near slope -1 with r2 ~ 1
    rows = []
    for r in range(1, 9):
        rows.extend([f"w{r}"] * round(64 / r))
    docs = spark.createDataFrame(
        [(1, " ".join(rows))], "doc_id long, text string"
    )
    got = zipf_fit(docs, top_n=8).first()
    freqs = sorted((round(64 / r) for r in range(1, 9)), reverse=True)
    assert got["n_tokens"] == sum(freqs)
    assert got["vocab"] == 8 and got["n_top"] == 8
    xs = [math.log(i + 1) for i in range(8)]
    ys = [math.log(f) for f in freqs]
    k = 8.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert abs(got["slope"] - slope) < 1e-4
    assert -1.1 < got["slope"] < -0.9
    assert got["r2"] > 0.99


def test_zipf_ties_rank_deterministically(spark):
    from smart_crawler_spark.operators.textops import zipf_fit

    # all words same frequency: slope 0, r2 NaN-free guard not needed
    # (vary=0 -> r2 division by zero yields NULL/NaN; pin slope=0)
    docs = spark.createDataFrame(
        [(1, "aa bb cc aa bb cc")], "doc_id long, text string"
    )
    got = zipf_fit(docs, top_n=3).first()
    assert got["slope"] == 0.0
    assert got["n_tokens"] == 6 and got["vocab"] == 3
