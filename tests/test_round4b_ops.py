"""Golden / differential tests for the round-4 extension operators:
encoding-quality gate, character entropy, prefix-containment
(truncation) dedup, hard-negative mining, leakage-safe group split."""

from __future__ import annotations

import hashlib
import math
import os
import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.operators.simsearch import hard_negative_topk
from smart_crawler_spark.operators.textops import (
    char_entropy,
    encoding_quality,
    truncation_pairs,
)

SF_DIR = "/root/testdata/sf0.001"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


# ------------------------------------------------------------- encoding


def test_encoding_quality_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "clean text here"),
            (2, "bad Ã© mojibake Ã© x"),          # 2 markers in 20 chars
            (3, "ctrl\x07char"),                   # BEL is a control char
            (4, "repl � char"),               # U+FFFD
            (5, "one Ã© marker " + "x" * 200),     # 1 marker, long: keep
            (6, "tab\tand\nnewline are fine"),     # \t \n NOT control
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in encoding_quality(docs).collect()}
    assert got[1] == {
        "doc_id": 1, "n_chars": 15, "n_replacement": 0, "n_ctrl": 0,
        "n_mojibake": 0, "keep": True,
    }
    assert got[2]["n_mojibake"] == 2 and got[2]["keep"] is False
    assert got[3]["n_ctrl"] == 1 and got[3]["keep"] is False
    assert got[4]["n_replacement"] == 1 and got[4]["keep"] is False
    assert got[5]["n_mojibake"] == 1 and got[5]["keep"] is True
    assert got[6]["n_ctrl"] == 0 and got[6]["keep"] is True


# -------------------------------------------------------------- entropy


def _py_entropy(text: str):
    t = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
    if not t:
        return None
    counts = Counter(t)
    n = len(t)
    ent = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
    return len(t), len(counts), round(ent, 6)


def test_char_entropy_matches_python(spark):
    rng = random.Random(42)
    rows = [
        (1, "aaaaaaaaaa"),                     # zero entropy
        (2, "abcdefghij"),                     # uniform: ln(10)
        (3, "Hello, World! Hello again."),
        (4, "!!!???"),                         # empty after normalization
        (5, "".join(rng.choice("abc def 123") for _ in range(300))),
        (6, "the quick brown fox jumps over the lazy dog " * 5),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in char_entropy(docs).collect()}
    assert 4 not in got  # dropped: nothing left after normalization
    for doc_id, text in rows:
        exp = _py_entropy(text)
        if exp is None:
            continue
        n, d, ent = exp
        assert got[doc_id]["n_chars"] == n
        assert got[doc_id]["n_distinct"] == d
        assert abs(got[doc_id]["entropy"] - ent) <= 1e-6, (doc_id, text)
    assert got[1]["entropy"] == 0.0
    assert abs(got[2]["entropy"] - round(math.log(10), 6)) <= 1e-6


# ----------------------------------------------------------- truncation


def test_truncation_pairs_golden_and_plan(spark):
    base = " ".join(f"w{i}" for i in range(60))  # ~290 chars, one space
    a = base[:200]
    docs = spark.createDataFrame(
        [
            (1, a),                                   # the long doc
            (2, a[:100]),                             # truncated twin
            (3, a),                                   # exact dup: NO pair
            (4, a[:40]),                              # below prefix_len
            (5, "z" + a[1:120]),                      # different prefix
            (6, a[:100].upper().replace(" ", "  ")),  # normalizes to a[:100]
        ],
        "doc_id long, text string",
    )
    out = truncation_pairs(docs, prefix_len=64)
    pairs = {(r["id_short"], r["id_long"]) for r in out.collect()}
    # 2 and 6 both normalize to a[:100]: each is a strict prefix of the
    # two full copies (1, 3) but not of each other (equal length)
    assert pairs == {(2, 1), (2, 3), (6, 1), (6, 3)}
    row = {
        (r["id_short"], r["id_long"]): r.asDict() for r in out.collect()
    }[(2, 1)]
    assert row["short_len"] == 100 and row["long_len"] == 200

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_truncation_pairs_hot_bucket_cap(spark):
    """> max_bucket docs sharing a prefix key are template boilerplate:
    the cap must drop the whole bucket, not pair it quadratically."""
    shared = "the same boilerplate opening sentence repeated everywhere ok"
    rows = [(i, shared + f" tail {i}") for i in range(10)]
    rows.append((100, shared))  # a strict prefix of every other row
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert truncation_pairs(docs, prefix_len=60, max_bucket=5).count() == 0
    got = truncation_pairs(docs, prefix_len=60, max_bucket=50)
    assert {(r["id_short"], r["id_long"]) for r in got.collect()} == {
        (100, i) for i in range(10)
    }


# -------------------------------------------------------- hard negatives


def test_hard_negative_topk_excludes_dups(spark):
    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        nu = math.sqrt(sum(x * x for x in u))
        nv = math.sqrt(sum(x * x for x in v))
        return round(d / (nu * nv), 6)

    q = [1.0, 0.0, 0.0, 0.0]
    vecs = {
        0: q,
        1: [0.99, 0.05, 0.0, 0.0],   # near-dup: cos ~0.999 -> excluded
        2: [0.8, 0.6, 0.0, 0.0],     # cos 0.8 -> hardest negative
        3: [0.5, 0.866, 0.0, 0.0],   # cos 0.5
        4: [0.0, 0.0, 1.0, 0.0],     # cos 0.0
    }
    assert cos(q, vecs[1]) > 0.95
    emb = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    out = hard_negative_topk(
        emb.filter(F.col("vec_id") == 0), emb, k=2, dup_threshold=0.95
    ).collect()
    assert [(r["negative_id"], r["rank"]) for r in out] == [(2, 1), (3, 2)]
    assert all(r["cos_sim"] < 0.95 for r in out)
    assert out[0]["cos_sim"] == cos(q, vecs[2])


# ----------------------------------------------------------- group split


@needs_testdata
def test_group_split_no_leakage(spark):
    """The leakage invariant: every near-dup component lands entirely in
    ONE split, and the split is the md5 draw on the component label."""
    import __spark_entry__ as entry

    out = entry.group_split(spark, SF_DIR)
    rows = out.collect()
    assert rows, "split produced no rows"
    by_comp: dict[int, set] = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values()), "component straddles"
    for comp, splits in by_comp.items():
        b = int(hashlib.md5(str(comp).encode()).hexdigest()[:8], 16) % 10
        exp = "train" if b < 8 else ("val" if b == 8 else "test")
        assert splits == {exp}
    assert {r["split"] for r in rows} <= {"train", "val", "test"}


# ------------------------------------------------------- redirect chains


def _py_resolve(edges: dict):
    out = {}
    for u in edges:
        cur, hops, seen = u, 0, set()
        cyc = False
        while cur in edges:
            if cur in seen:
                cyc = True
                break
            seen.add(cur)
            cur = edges[cur]
            hops += 1
        out[u] = (None, -1, True) if cyc else (cur, hops, False)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_redirect_chains_random_functional_graphs(spark, seed):
    """Path doubling == the single-step walk on random redirect maps
    with organic chains, merges, and cycles."""
    from smart_crawler_spark.operators.graphops import (
        resolve_redirect_chains,
    )

    rng = random.Random(seed)
    n = 60
    edges = {
        u: rng.randrange(n) for u in range(n) if rng.random() < 0.7
    }
    edges = {u: v for u, v in edges.items() if u != v}
    exp = _py_resolve(edges)
    df = spark.createDataFrame(
        [(f"u{a}", f"u{b}") for a, b in edges.items()],
        "src string, dst string",
    )
    out = resolve_redirect_chains(df, max_chain=n + 1)
    got = {
        r["url"]: (r["final_url"], r["hops"], r["is_cycle"])
        for r in out.collect()
    }
    assert got == {
        f"u{u}": (None if f is None else f"u{f}", h, c)
        for u, (f, h, c) in exp.items()
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_redirect_chain_long_vs_rounds(spark):
    """A 40-hop chain resolves with hops == exact length (saturating
    distance accumulation), and a pure k-cycle yields all-cycle rows."""
    from smart_crawler_spark.operators.graphops import (
        resolve_redirect_chains,
    )

    chain = [(f"c{i}", f"c{i+1}") for i in range(40)]
    cyc = [("x0", "x1"), ("x1", "x2"), ("x2", "x0")]
    df = spark.createDataFrame(chain + cyc, "src string, dst string")
    got = {
        r["url"]: r.asDict()
        for r in resolve_redirect_chains(df, max_chain=64).collect()
    }
    assert got["c0"] == {
        "url": "c0", "final_url": "c40", "hops": 40, "is_cycle": False,
    }
    assert got["c39"]["hops"] == 1
    for x in ("x0", "x1", "x2"):
        assert got[x]["is_cycle"] and got[x]["final_url"] is None
        assert got[x]["hops"] == -1


# --------------------------------------------------------------- k-core


def _py_kcore(pairs, k, rounds):
    und = set()
    for s, d in pairs:
        und.add((s, d))
        und.add((d, s))
    for _ in range(rounds):
        deg = Counter(s for s, _ in und)
        alive = {u for u, c in deg.items() if c >= k}
        und = {(s, d) for s, d in und if s in alive and d in alive}
    return dict(Counter(s for s, _ in und))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_kcore_random_graphs(spark, seed):
    from smart_crawler_spark.operators.graphops import kcore

    rng = random.Random(100 + seed)
    n = 40
    pairs = {
        (rng.randrange(n), rng.randrange(n)) for _ in range(90)
    }
    pairs = {(a, b) for a, b in pairs if a != b}
    exp = _py_kcore(pairs, k=3, rounds=8)
    # 8 rounds is a fixpoint at this size: one more round is a no-op
    assert exp == _py_kcore(pairs, k=3, rounds=9)
    df = spark.createDataFrame(
        [(a, b) for a, b in sorted(pairs)], "src long, dst long"
    )
    got = {
        r["node"]: r["degree"]
        for r in kcore(df, k=3, rounds=8).collect()
    }
    assert got == exp


def test_kcore_clique_plus_tail(spark):
    """A 5-clique survives k=3 peeling intact (degree 4 each); a path
    hanging off it peels away completely."""
    from smart_crawler_spark.operators.graphops import kcore

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    tail = [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + tail, "src long, dst long")
    got = {
        r["node"]: r["degree"]
        for r in kcore(df, k=3, rounds=6).collect()
    }
    assert got == {i: 4 for i in range(5)}


# --------------------------------------------------------- trustrank


def _py_ppr(edges, seeds, iters, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    out = {u: [] for u in nodes}
    for s, t in edges:
        out[s].append(t)
    tv = {u: (1.0 / len(seeds) if u in seeds else 0.0) for u in nodes}
    pr = dict(tv)
    for _ in range(iters):
        nxt = {u: 0.0 for u in nodes}
        dangling = sum(pr[u] for u in nodes if not out[u])
        for u in nodes:
            for v in out[u]:
                nxt[v] += pr[u] / len(out[u])
        pr = {
            u: (1 - d) * tv[u] + d * (nxt[u] + dangling * tv[u])
            for u in nodes
        }
    return pr


@pytest.mark.parametrize("seed", [0, 1])
def test_personalized_pagerank_random(spark, seed):
    """Operator == the textbook PPR recurrence on random directed
    graphs WITH dangling nodes (mass teleports to the seed set), seeds
    a random subset. Mass conservation: sum(pr) == 1."""
    from smart_crawler_spark.operators.graphops import (
        personalized_pagerank,
    )

    rng = random.Random(7 + seed)
    n = 25
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(60)}
    edges = sorted((a, b) for a, b in edges if a != b)
    # make node 0 dangling: drop its out-edges
    edges = [(a, b) for a, b in edges if a != 0]
    seeds = sorted(rng.sample(range(n), 4))
    exp = _py_ppr(edges, set(seeds), iters=6)
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r["node"]: r["pr"]
        for r in personalized_pagerank(df, sdf, iters=6).collect()
    }
    assert set(got) == set(exp)
    for u in exp:
        assert abs(got[u] - exp[u]) < 1e-9, u
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_personalized_pagerank_concentrates_on_seeds(spark):
    """On a graph of two disconnected cliques, all mass stays in the
    seeded clique — the spam-demotion property uniform PageRank lacks."""
    from smart_crawler_spark.operators.graphops import (
        personalized_pagerank,
    )

    c1 = [(a, b) for a in range(4) for b in range(4) if a != b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a != b]
    df = spark.createDataFrame(c1 + c2, "src long, dst long")
    sdf = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["pr"]
        for r in personalized_pagerank(df, sdf, iters=8).collect()
    }
    assert sum(v for u, v in got.items() if u >= 10) == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-9


# ------------------------------------------------------ html tag stats


def test_html_tag_stats_golden(spark):
    from smart_crawler_spark.operators.textops import html_tag_stats

    html = (
        '<html><body><a href="/x">one</a><a href="/y">two</a>'
        '<script src="s.js"></script><img src="i.png"><p>hello</p>'
        "</body></html>"
    )
    docs = spark.createDataFrame(
        [(1, html), (2, "no markup at all"), (3, "")],
        "doc_id long, html string",
    )
    got = {r["doc_id"]: r.asDict() for r in html_tag_stats(docs).collect()}
    # tags: html body a /a a /a script /script img p /p /body /html = 13
    assert got[1]["n_tags"] == 13
    assert got[1]["n_links"] == 2
    assert got[1]["n_scripts"] == 1
    assert got[1]["n_imgs"] == 1
    assert got[1]["text_chars"] == len("onetwohello")
    assert got[1]["n_chars"] == len(html)
    assert got[1]["text_ratio"] == round(len("onetwohello") / len(html), 6)
    assert got[2] == {
        "doc_id": 2, "n_tags": 0, "n_links": 0, "n_scripts": 0,
        "n_imgs": 0, "n_chars": 16, "text_chars": 16, "text_ratio": 1.0,
    }
    assert got[3]["text_ratio"] == 0.0  # empty doc: guarded division


# ----------------------------------------------------- truncated recall


def test_truncated_recall_audit_matches_python(spark):
    """Overlap of full-dim vs prefix-dim exact top-k, mirrored in
    python with the same rounded-cosine + id tie-break."""
    from smart_crawler_spark.operators.simsearch import (
        truncated_recall_audit,
    )

    rng = random.Random(5)
    n, dim, dims, k = 12, 4, 2, 3
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(dim)] for i in range(n)
    }

    def topk(d):
        out = {}
        for q in range(3):
            scored = []
            for c, v in vecs.items():
                if c == q:
                    continue
                dot = sum(x * y for x, y in zip(vecs[q][:d], v[:d]))
                nq = math.sqrt(sum(x * x for x in vecs[q][:d]))
                nc = math.sqrt(sum(x * x for x in v[:d]))
                scored.append((round(dot / (nq * nc), 6), c))
            scored.sort(key=lambda t: (-t[0], t[1]))
            out[q] = {c for _, c in scored[:k]}
        return out

    full, trunc = topk(dim), topk(dims)
    exp = {q: len(full[q] & trunc[q]) for q in full}
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["query_id"]: (r["n_overlap"], r["recall"])
        for r in truncated_recall_audit(
            emb.filter(F.col("vec_id") < 3), emb, dims=dims, k=k
        ).collect()
    }
    assert got == {q: (o, round(o / k, 6)) for q, o in exp.items()}


# ---------------------------------------------------- numeric histogram


def test_numeric_histogram_golden(spark):
    from smart_crawler_spark.operators.relational import numeric_histogram

    df = spark.createDataFrame(
        [(0,), (5,), (19,), (20,), (39,), (40,), (100,), (None,)],
        "v int",
    )
    got = {
        r["bin_id"]: r.asDict()
        for r in numeric_histogram(df, "v", bin_width=20.0).collect()
    }
    assert {b: r["n_rows"] for b, r in got.items()} == {0: 3, 1: 2, 2: 1, 5: 1}
    assert got[1]["lo"] == 20.0 and got[1]["hi"] == 40.0
    assert got[5]["lo"] == 100.0  # sparse: bins 3,4 absent


# ------------------------------------------------------- corpus summary


def test_corpus_summary_golden(spark):
    from smart_crawler_spark.operators.textops import corpus_summary

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the park"),
            (2, "der hund ist nicht mit das und der"),
            (3, "12345 67890"),
        ],
        "doc_id long, text string",
    )
    row = corpus_summary(docs).collect()[0].asDict()
    assert row["n_docs"] == 3
    assert row["total_words"] == 9 + 8 + 2
    assert row["n_en"] == 1 and row["n_de"] == 1 and row["n_und"] == 1
    assert row["n_fr"] == 0
    assert 0.0 < row["avg_quality"] <= 1.0


# -------------------------------------------------------- tf-idf cosine


def test_tfidf_cosine_pairs_matches_python(spark):
    """Inverted-index tf-idf cosine == a dense python replay (same
    plain ln(N/df) idf, df cap applied before norms on BOTH paths)."""
    from smart_crawler_spark.operators.textops import tfidf_cosine_pairs

    texts = {
        1: "rare unique zebra quagga walks home",
        2: "rare unique zebra quagga walks home",   # exact dup of 1
        3: "zebra quagga in the wild grass",        # partial overlap
        4: "totally different words entirely here",
        5: "the the the the common only",
    }
    max_df = 4
    import collections
    tf = {i: collections.Counter(t.split()) for i, t in texts.items()}
    df = collections.Counter(w for c in tf.values() for w in c)
    n = len(texts)
    kept = {w for w, d in df.items() if d <= max_df}
    wv = {
        i: {
            w: c * math.log(n / df[w])
            for w, c in cnt.items()
            if w in kept
        }
        for i, cnt in tf.items()
    }
    def cos(a, b):
        dot = sum(wv[a][w] * wv[b][w] for w in wv[a] if w in wv[b])
        na = math.sqrt(sum(x * x for x in wv[a].values()))
        nb = math.sqrt(sum(x * x for x in wv[b].values()))
        return round(dot / (na * nb), 6) if na and nb and dot else 0.0
    exp = {
        (a, b): cos(a, b)
        for a in texts
        for b in texts
        if a < b and cos(a, b) >= 0.3
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            docs, threshold=0.3, max_df=max_df
        ).collect()
    }
    assert got == exp
    assert got[(1, 2)] == 1.0  # exact dup
    assert (1, 4) not in got   # disjoint vocab


# ---------------------------------------------------------- event funnel


def test_funnel_counts_ordering_and_window(spark):
    """Order matters (a click BEFORE the first view doesn't count) and
    the window is anchored at the FIRST step-1 event."""
    from datetime import datetime

    from smart_crawler_spark.operators.relational import funnel_counts

    T = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 completes in order
        (1, "view", T(0)), (1, "click", T(5)), (1, "purchase", T(9)),
        # u2 clicks BEFORE viewing: click must not count
        (2, "click", T(0)), (2, "view", T(1)), (2, "purchase", T(2)),
        # u3 views, clicks, but purchase outside the 10-min window
        (3, "view", T(0)), (3, "click", T(2)), (3, "purchase", T(30)),
        # u4 never views
        (4, "click", T(0)), (4, "purchase", T(1)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r["step"]: r.asDict()
        for r in funnel_counts(
            ev, ["view", "click", "purchase"], within_s=600
        ).collect()
    }
    assert got[1]["n_users"] == 3          # u1 u2 u3 viewed
    assert got[2]["n_users"] == 2          # u1 u3 (u2's click precedes)
    assert got[3]["n_users"] == 1          # u1 only (u3 out of window)
    assert got[3]["conversion"] == round(1 / 3, 6)
    assert got[2]["event_type"] == "click"


def test_retention_cohorts_golden(spark):
    from datetime import datetime

    from smart_crawler_spark.operators.relational import retention_cohorts

    D = lambda d, h=0: datetime(2024, 1, d, h)  # noqa: E731
    rows = [
        (1, D(1)), (1, D(1, 5)), (1, D(3)),     # cohort 1/1: d0, d2
        (2, D(1)), (2, D(2)),                   # cohort 1/1: d0, d1
        (3, D(2)), (3, D(2, 9)),                # cohort 1/2: d0 only
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


# ----------------------------------------------------------- merge upsert


def test_merge_upsert_semantics(spark):
    """SQL MERGE truth table: matched D deletes, matched U updates,
    unmatched I inserts; matched I and unmatched U/D are no-ops."""
    from smart_crawler_spark.operators.relational import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "key long, status string, price double",
    )
    changes = spark.createDataFrame(
        [
            (1, "D", None, None),        # delete
            (2, "U", "bb", 22.0),        # update
            (5, "I", "e", 50.0),         # insert
            (3, "I", "zz", 0.0),         # matched insert: no-op
            (9, "U", "zz", 0.0),         # unmatched update: no-op
            (8, "D", None, None),        # unmatched delete: no-op
        ],
        "key long, op string, status string, price double",
    )
    got = {
        r["key"]: (r["status"], r["price"])
        for r in merge_upsert(base, changes, key_col="key").collect()
    }
    assert got == {
        2: ("bb", 22.0),
        3: ("c", 30.0),
        4: ("d", 40.0),
        5: ("e", 50.0),
    }


# ------------------------------------------------------ rolling distinct


def test_rolling_distinct_matches_python(spark):
    """Bounded-explode sliding distinct == the brute-force per-day set
    union over a random activity matrix."""
    from datetime import date, datetime, timedelta

    from smart_crawler_spark.operators.relational import rolling_distinct

    rng = random.Random(11)
    rows = [
        (u, datetime(2024, 1, rng.randint(1, 15), rng.randint(0, 23)))
        for u in range(20)
        for _ in range(rng.randint(0, 5))
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    w = 4
    active: dict = {}
    for u, ts in rows:
        active.setdefault(ts.date(), set()).add(u)
    exp = {}
    for d0 in active:
        for k in range(w):
            day = d0 + timedelta(days=k)
            exp.setdefault(day, set()).update(active[d0])
    exp = {d: len(s) for d, s in exp.items()}
    got = {
        r["day"]: r["n_distinct_users"]
        for r in rolling_distinct(ev, window_days=w).collect()
    }
    assert got == exp
    # a user active on day d counts on d..d+w-1 only
    assert isinstance(next(iter(got)), date)


# ------------------------------------------------- cross-format phash


def test_cross_format_phash_invariant_and_threshold(spark):
    """PNG -> JPEG(q90) re-encode keeps the avg-phash within a couple
    of bits on the deterministic corpus, and the `within` flag really
    binds to max_hamming (0-threshold flips rows with hamming > 0)."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import (
        cross_format_phash_check,
    )

    corpus = generate_images(spark, 60, jpeg_every=10)
    out = cross_format_phash_check(corpus, quality=90, max_hamming=12)
    rows = out.collect()
    assert len(rows) == 54  # PNG rows only
    assert all(r["within"] for r in rows)
    assert max(r["hamming"] for r in rows) <= 4
    strict = cross_format_phash_check(corpus, quality=90, max_hamming=0)
    flipped = {
        r["image_id"]: r["within"] for r in strict.collect()
    }
    for r in rows:
        assert flipped[r["image_id"]] == (r["hamming"] == 0)
