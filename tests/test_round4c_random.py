"""Seeded randomized differential sweeps for the late round-4
operators: Spark vs an independent pure-Python reference on many small
random inputs (same pattern as test_random_graphs for the engine).
Python floats are IEEE doubles, so references that replicate the
operator's arithmetic order compare with == after the same round()."""

from __future__ import annotations

import math
import random
from collections import Counter

from pyspark.sql import functions as F  # noqa: F401

from smart_crawler_spark.operators.textops import pmi_collocations, rrf_fuse
from smart_crawler_spark.operators.evalmetrics import (
    calibration_bins,
    cohens_kappa,
    ndcg_at_k,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _pmi_ref(texts, min_count):
    uni, pairs = Counter(), Counter()
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        uni.update(ws)
        pairs.update(zip(ws, ws[1:]))
    n = float(sum(uni.values()))
    b = float(sum(pairs.values()))
    out = {}
    for (w1, w2), c in pairs.items():
        if c >= min_count:
            out[(w1, w2)] = (
                c,
                round(
                    math.log(
                        (float(c) * n * n)
                        / (b * float(uni[w1]) * float(uni[w2]))
                    ),
                    6,
                ),
            )
    return out


def test_pmi_random_differential(spark):
    rng = random.Random(13)
    for trial in range(6):
        texts = [
            " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 30)))
            for _ in range(rng.randint(3, 12))
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        mc = rng.choice([1, 2, 3])
        got = {
            (r["w1"], r["w2"]): (r["pair_count"], r["pmi"])
            for r in pmi_collocations(docs, min_count=mc).collect()
        }
        assert got == _pmi_ref(texts, mc), f"trial {trial}"


def _rrf_ref(la, lb, k_const, topn):
    ids = set(la) | set(lb)
    rows = []
    for i in sorted(ids):
        ra, rb = la.get(i, 0), lb.get(i, 0)
        sc = round(
            (1.0 / (k_const + ra) if ra else 0.0)
            + (1.0 / (k_const + rb) if rb else 0.0),
            6,
        )
        rows.append((i, ra, rb, sc))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return [
        (i, ra, rb, sc, pos + 1)
        for pos, (i, ra, rb, sc) in enumerate(rows[:topn])
    ]


def test_rrf_random_differential(spark):
    rng = random.Random(29)
    for trial in range(6):
        na, nb = rng.randint(1, 15), rng.randint(1, 15)
        ids = list(range(40))
        rng.shuffle(ids)
        la = {i: r + 1 for r, i in enumerate(ids[:na])}
        rng.shuffle(ids)
        lb = {i: r + 1 for r, i in enumerate(ids[:nb])}
        a = spark.createDataFrame(
            [(i, r) for i, r in la.items()], "doc_id long, rank int"
        )
        b = spark.createDataFrame(
            [(i, r) for i, r in lb.items()], "doc_id long, rank int"
        )
        topn = rng.choice([3, 5, 50])
        got = [
            (r["id"], r["rank_a"], r["rank_b"], r["rrf_score"], r["fused_rank"])
            for r in rrf_fuse(a, b, k_const=60, topn=topn).collect()
        ]
        got.sort(key=lambda r: r[4])
        assert got == _rrf_ref(la, lb, 60, topn), f"trial {trial}"


def test_kappa_random_differential(spark):
    rng = random.Random(31)
    for trial in range(6):
        n = rng.randint(4, 60)
        rows = [(rng.random() < 0.6, rng.random() < 0.5) for _ in range(n)]
        # guarantee non-constant marginals so p_e < 1
        rows[0] = (True, False)
        rows[1] = (False, True)
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        r = cohens_kappa(df).first()
        tt = sum(1 for a, b in rows if a and b)
        tf = sum(1 for a, b in rows if a and not b)
        ft = sum(1 for a, b in rows if not a and b)
        ff = sum(1 for a, b in rows if not a and not b)
        po = (tt + ff) / n
        pe = ((tt + tf) * (tt + ft) + (ft + ff) * (tf + ff)) / (n * n)
        assert r["n"] == n
        assert r["p_o"] == round(po, 6) and r["p_e"] == round(pe, 6)
        assert r["kappa"] == round((po - pe) / (1 - pe), 6), f"trial {trial}"


def test_calibration_random_differential(spark):
    rng = random.Random(37)
    for trial in range(4):
        n = rng.randint(5, 80)
        rows = [
            (round(rng.random(), 6), rng.random() < 0.5) for _ in range(n)
        ]
        df = spark.createDataFrame(rows, "score double, label boolean")
        nb = rng.choice([4, 10])
        got = {r["bin"]: r for r in calibration_bins(df, n_bins=nb).collect()}
        ref = {}
        for s, y in rows:
            b = min(int(math.floor(s * nb)), nb - 1)
            cnt, sm, np_ = ref.get(b, (0, 0, 0))
            ref[b] = (cnt + 1, sm + int(round(s * 1000000)), np_ + int(y))
        assert set(got) == set(ref)
        for b, (cnt, sm, np_) in ref.items():
            assert got[b]["n"] == cnt
            assert got[b]["mean_score"] == round(sm / (1000000.0 * cnt), 6)
            assert got[b]["pos_rate"] == round(np_ / cnt, 6), f"trial {trial}"


def test_ndcg_random_differential(spark):
    rng = random.Random(41)
    for trial in range(5):
        n_items = rng.randint(5, 25)
        k = rng.choice([3, 5, 10])
        ranked = [(i, r + 1) for r, i in enumerate(rng.sample(range(60), n_items))]
        rels = {i: rng.randint(0, 5) for i in rng.sample(range(60), 30)}
        rdf = spark.createDataFrame(ranked, "id long, rank int")
        ldf = spark.createDataFrame(
            list(rels.items()), "id long, rel long"
        )
        row = ndcg_at_k(rdf, ldf, k=k, id_col="id").first()
        dcg = sum(
            (2.0 ** rels.get(i, 0) - 1.0) / math.log2(r + 1.0)
            for i, r in ranked
            if r <= k
        )
        ideal = sorted(rels.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        idcg = sum(
            (2.0 ** rel - 1.0) / math.log2(pos + 2.0)
            for pos, (_, rel) in enumerate(ideal)
        )
        assert row["dcg"] == round(dcg, 6)
        assert row["idcg"] == round(idcg, 6)
        assert row["ndcg"] == round(round(dcg, 6) / round(idcg, 6), 6), (
            f"trial {trial}"
        )
