"""Differential / property tests for the round-4 continuation
operators: hashed n-gram classifier, document chunking, Z-order keys,
label propagation, temperature mixing, paired-cosine alignment."""

from __future__ import annotations

import hashlib
import math
import random
import re

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.operators.graphops import label_propagation
from smart_crawler_spark.operators.relational import (
    temperature_mix,
    zorder_key,
    zorder_tile_stats,
)
from smart_crawler_spark.operators.textops import (
    chunk_documents,
    hashed_ngram_classifier,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------- fastText


def _py_classifier(text: str, n_buckets: int = 4096):
    ws = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    feats = ws + [f"{a}_{b}" for a, b in zip(ws, ws[1:])]
    if not feats:
        return None
    total = 0.0
    for f in feats:
        b = _h32(f) % n_buckets
        total += (_h32(str(b)) % 2001 - 1000) / 1000.0
    avg = total / len(feats)
    return len(feats), round(1.0 / (1.0 + math.exp(-avg)), 4)


def test_classifier_matches_python(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "spark spark spark",
        "a",
        "",
        "  ---  ",  # zero tokens -> dropped
        "one two three four five six seven eight nine ten",
        "Der schnelle braune Fuchs! 123 456",
        "x y " * 50,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["score"], r["label"])
        for r in hashed_ngram_classifier(df).collect()
    }
    for i, t in enumerate(texts):
        exp = _py_classifier(t)
        if exp is None:
            assert i not in got
        else:
            n, score = exp
            assert got[i] == (n, score, score >= 0.5), (i, t)


# ---------------------------------------------------------------- chunking


def test_chunk_properties(spark):
    rng = random.Random(7)
    texts = ["", "x", "a" * 499, "b" * 500, "c" * 501, "d" * 900]
    texts += [
        "".join(rng.choice("abcdef ") for _ in range(rng.randrange(1, 3000)))
        for _ in range(20)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(df, size=500, overlap=100).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not t:
            assert chunks == []
            continue
        # offsets follow the stride; substr bounds are honest
        for j, c in enumerate(chunks):
            assert c["chunk_id"] == j
            assert c["char_start"] == j * 400
            assert c["chunk"] == t[c["char_start"] : c["char_start"] + 500]
            assert c["n_chars"] == len(c["chunk"])
        # full coverage by reconstruction
        rebuilt = chunks[0]["chunk"] + "".join(
            c["chunk"][100:] for c in chunks[1:]
        )
        assert rebuilt == t
        # no chunk fully contained in its predecessor
        for a, b in zip(chunks, chunks[1:]):
            assert (
                b["char_start"] + b["n_chars"] > a["char_start"] + a["n_chars"]
            )


# ---------------------------------------------------------------- z-order


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i + 1)
        out |= ((y >> i) & 1) << (2 * i)
    return out


def test_zorder_key_matches_python(spark):
    rng = random.Random(11)
    pts = [(rng.randrange(4096), rng.randrange(4096)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), bits=12).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_morton(r["x"], r["y"], 12)


def test_zorder_tiles_bound_both_dims(spark):
    # full-range uniform grid (all 12 bits exercised): every tile must
    # span <= 256 in each dim
    pts = [(x * 64 + 3, y * 64 + 5) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    stats = zorder_tile_stats(df, "x", "y", bits=12, tile_bits=8).collect()
    assert len(stats) == 256
    for r in stats:
        assert r["max_x"] - r["min_x"] <= 255
        assert r["max_y"] - r["min_y"] <= 255


# ------------------------------------------------------ label propagation


def _py_lpa(edges, iters):
    und = set()
    for u, v in edges:
        und.add((u, v))
        und.add((v, u))
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    nodes = sorted(nbrs)
    lab = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            cnt: dict[int, int] = {}
            for b in nbrs[n]:
                cnt[lab[b]] = cnt.get(lab[b], 0) + 1
            new[n] = (
                max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                if cnt
                else n
            )
        lab = new
    return lab


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_label_propagation_random(spark, seed):
    rng = random.Random(seed)
    n = rng.randrange(10, 40)
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randrange(n, 3 * n))
    ]  # may include self-loops and parallel edges
    df = spark.createDataFrame(edges, "src long, dst long")
    iters = rng.choice([1, 2, 4])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, iters=iters).collect()
    }
    assert got == _py_lpa(edges, iters)


# ------------------------------------------------------- temperature mix


def test_temperature_mix_flattens(spark):
    rows = [(i, "en" if i % 10 < 7 else ("de" if i % 10 < 9 else "fr"))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix(df, "lang", "doc_id", alpha=0.5)
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    n_in = {"en": 1400, "de": 400, "fr": 200}
    # survivors only, deterministic across runs
    again = {
        r["lang"]: r["count"]
        for r in temperature_mix(df, "lang", "doc_id", alpha=0.5)
        .groupBy("lang")
        .count()
        .collect()
    }
    assert counts == again
    for lang, c in counts.items():
        assert c <= n_in[lang]
    # the binding domain (smallest n/t = smallest n at alpha<1) keeps all
    assert counts["fr"] == n_in["fr"]
    # flattening: the dominant domain's share shrinks toward uniform
    tot = sum(counts.values())
    assert counts["en"] / tot < 0.7
    # shares approach the alpha-scaled targets (within sampling noise)
    z = sum(v**0.5 for v in n_in.values())
    for lang, c in counts.items():
        target = n_in[lang] ** 0.5 / z
        assert abs(c / tot - target) < 0.05


# ----------------------------------------------------------- host graph


def test_host_graph_matches_python(spark):
    rng = random.Random(3)
    hosts = [f"h{i}.test" for i in range(5)]
    links = []
    for _ in range(400):
        s = rng.choice(hosts)
        d = rng.choice(hosts)
        page = f"http://{s}/p/{rng.randrange(20)}"
        links.append((page, f"http://{d}/q/{rng.randrange(30)}"))
    from smart_crawler_spark.operators.graphops import host_graph

    df = spark.createDataFrame(links, "src string, dst string")
    got = {
        (r["src_host"], r["dst_host"]): (
            r["n_links"], r["n_src_pages"], r["internal"]
        )
        for r in host_graph(df).collect()
    }
    exp: dict = {}
    pages: dict = {}
    for src, dst in links:
        sh = src.split("/")[2]
        dh = dst.split("/")[2]
        exp[(sh, dh)] = exp.get((sh, dh), 0) + 1
        pages.setdefault((sh, dh), set()).add(src)
    assert got == {
        k: (n, len(pages[k]), k[0] == k[1]) for k, n in exp.items()
    }


# ------------------------------------------------------------- outliers


def test_embedding_outliers_flags_planted(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(200)]
    # plant 5 far-off rows
    rows += [
        (1000 + i, [float(x) for x in rng.normal(0, 1, 16) * 6])
        for i in range(5)
    ]
    from smart_crawler_spark.operators.simsearch import embedding_outliers

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["outlier"] for r in embedding_outliers(df).collect()}
    assert all(out[1000 + i] for i in range(5))
    # the bulk is not flagged
    flagged_bulk = sum(1 for i in range(200) if out[i])
    assert flagged_bulk <= 10


# ------------------------------------------------------ count-min sketch


def test_cms_never_underestimates(spark):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 60)))
        for _ in range(150)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from smart_crawler_spark.operators.textops import (
        cms_frequency_estimates,
    )

    true: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            true[w] = true.get(w, 0) + 1
    terms = vocab[:40] + ["absent_term"]
    rows = cms_frequency_estimates(df, terms, depth=4, width=512).collect()
    assert {r["term"] for r in rows} == set(terms)
    for r in rows:
        assert r["true_n"] == true.get(r["term"], 0)
        assert r["cms_est"] >= r["true_n"]  # the CMS one-sided guarantee
        assert r["never_under"]
    # with 300 words in 4x512 cells, most estimates should be exact
    exact = sum(1 for r in rows if r["cms_est"] == r["true_n"])
    assert exact >= len(terms) * 0.5


# ------------------------------------------------------- paired cosine


def test_paired_cosine_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    rows = [
        (
            i,
            [float(x) for x in rng.normal(0, 1, 8)],
            [float(x) for x in rng.normal(0, 1, 8)],
        )
        for i in range(100)
    ]
    from smart_crawler_spark.operators.simsearch import paired_cosine_filter

    df = spark.createDataFrame(
        rows, "pid long, a array<double>, b array<double>"
    )
    got = {
        r["pid"]: (r["align_cos"], r["keep"])
        for r in paired_cosine_filter(df, "a", "b", threshold=0.2).collect()
    }
    for pid, a, b in rows:
        a = np.array(a)
        b = np.array(b)
        cos = round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )
        assert got[pid] == (cos, cos >= 0.2)
