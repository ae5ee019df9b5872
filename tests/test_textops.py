"""Hand-computed goldens for the text-pipeline operators (beyond the
DuckDB oracle gate, which checks engine equivalence — these pin the
intended semantics)."""

from pyspark.sql import functions as F  # noqa: F401


def test_repetition_stats_golden(spark):
    from smart_crawler_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 words, all distinct; bigrams: "a b","b c","c d" distinct
            (1, "a b c d"),
            # "spam spam spam spam": words 4/1 distinct -> 0.75;
            # bigrams 3 total 1 distinct -> 2/3; trigrams 2/1 -> 0.5
            (2, "spam spam spam spam"),
            # short doc: 2 words, no trigrams -> trigram frac 0
            (3, "ab ab"),
            # empty after tokenization
            (4, "!!!"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["n_words"] == 4
    assert got[1]["dup_word_frac"] == 0.0
    assert got[1]["dup_bigram_frac"] == 0.0
    assert got[2]["dup_word_frac"] == 0.75
    assert round(got[2]["dup_bigram_frac"], 6) == round(2 / 3, 6)
    assert got[2]["dup_trigram_frac"] == 0.5
    assert got[3]["n_words"] == 2
    assert got[3]["dup_word_frac"] == 0.5
    assert got[3]["dup_bigram_frac"] == 0.0  # one bigram, distinct
    assert got[3]["dup_trigram_frac"] == 0.0  # below n: empty, not NaN
    assert got[4]["n_words"] == 0
    assert got[4]["dup_word_frac"] == 0.0


def test_benchmark_contamination_golden_and_plan(spark):
    """Hand-computed contamination flags, multiplicity semantics
    (n_hits counts DISTINCT benchmark grams, repeats inside one doc
    count once), and the scale-plan pin: no cartesian/nested-loop join,
    and the gram probe is a broadcast hash join."""
    from smart_crawler_spark.operators.textops import benchmark_contamination

    g13 = " ".join(f"t{k}" for k in range(13))  # one known 13-gram
    docs = spark.createDataFrame(
        [
            (1, "prefix " + g13 + " suffix"),          # 1 bench gram
            (2, g13 + " mid " + g13),                  # repeat: still 1
            (3, "clean words only " + " ".join(f"u{k}" for k in range(13))),
            (4, "short doc"),                          # < 13 words
            (5, g13 + " t13"),                         # 2 grams: g13 + shifted
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(g13 + " t13",)], "text string"
    )  # bench grams: {t0..t12, t1..t13}
    out = benchmark_contamination(docs, bench, n=13)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[1] == {"doc_id": 1, "n_hits": 1, "contaminated": True}
    assert got[2] == {"doc_id": 2, "n_hits": 1, "contaminated": True}
    assert got[3]["contaminated"] is False and got[3]["n_hits"] == 0
    assert got[4]["contaminated"] is False
    assert got[5] == {"doc_id": 5, "n_hits": 2, "contaminated": True}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_sequence_pack_matches_flat_prefix_sum(spark):
    """The two-phase prefix sum (per-bucket cumsum + broadcast bucket
    offsets) must equal the flat single-stream layout, and the chunk
    geometry must be consistent: offsets in [0, budget), straddles iff
    the doc crosses a 32-token boundary."""
    import hashlib

    from smart_crawler_spark.operators.textops import sequence_pack

    budget, n_buckets = 32, 8
    docs = [(i, " ".join(["w"] * ((i * 7) % 13 + 1))) for i in range(40)]
    # one empty doc: occupies zero width, may sit at offset 0 of any seq
    docs.append((40, "   "))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in sequence_pack(
            df, budget=budget, n_buckets=n_buckets
        ).collect()
    }

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n_buckets

    stream = sorted(
        ((bucket(i), i, len(t.split()))) for i, t in docs
    )
    off = 0
    for _b, i, n in stream:
        assert got[i]["n_tokens"] == n
        assert got[i]["seq_id"] == off // budget
        assert got[i]["seq_offset"] == off % budget
        end = off + max(n, 1) - 1
        assert got[i]["straddles"] == (end // budget > off // budget)
        off += n


def test_redact_pii_golden(spark):
    from smart_crawler_spark.operators.textops import redact_pii

    docs = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example.com and alice@ex.org now"),
            (1, "call 555-123-4567 or 555-000-9999 from 192.168.1.254"),
            (2, "no pii here, 1234-5678 is not a phone, 1.2.3 not an ip"),
            (3, "edge 10.0.0.1 555-111-2222 u@v.io"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[0]["clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert (got[0]["n_emails"], got[0]["n_phones"], got[0]["n_ips"]) == (2, 0, 0)
    assert got[1]["clean_text"] == "call <PHONE> or <PHONE> from <IP>"
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (0, 2, 1)
    assert got[2]["clean_text"] == docs.collect()[2]["text"]
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 0, 0)
    assert got[3]["clean_text"] == "edge <IP> <PHONE> <EMAIL>"


def test_line_dedup_strips_boilerplate(spark):
    from smart_crawler_spark.operators.textops import line_dedup

    docs = spark.createDataFrame(
        [
            (0, "unique alpha\nSUBSCRIBE NOW\nunique beta"),
            (1, "other text\nSUBSCRIBE NOW"),
            (2, "solo document\nwith two lines"),
            (3, "SUBSCRIBE NOW\nSUBSCRIBE NOW"),  # all lines boilerplate
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert got[0]["n_lines"] == 3 and got[0]["dup_lines"] == 1
    assert got[0]["clean_text"] == "unique alpha\nunique beta"
    assert got[1]["clean_text"] == "other text"
    assert got[2]["dup_lines"] == 0
    assert got[2]["clean_text"] == "solo document\nwith two lines"
    # a doc made ONLY of boilerplate collapses to the empty string
    assert got[3]["n_lines"] == 2 and got[3]["dup_lines"] == 2
    assert got[3]["clean_text"] == ""
    assert got[3]["dup_frac"] == 1.0


def test_bm25_topk_matches_reference_formula(spark):
    import math

    from smart_crawler_spark.operators.textops import bm25_topk

    corpus = [
        (0, "spark window merge spark spark"),
        (1, "window window window other words here"),
        (2, "merge alone in a much longer document of many words"),
        (3, "nothing relevant at all"),
        (4, "spark"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = bm25_topk(docs, ["spark", "window", "merge"], k=3).collect()
    # reference python BM25 (same Robertson idf / k1=1.2 b=0.75)
    toks = {d: t.split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    def score(d):
        s = 0.0
        for term in ("spark", "window", "merge"):
            tf = toks[d].count(term)
            if not tf:
                continue
            df = sum(term in t for t in toks.values())
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks[d]) / avgdl))
        return round(s, 4)
    want = sorted(toks, key=lambda d: (-score(d), d))[:3]
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert abs(r["score"] - score(r["doc_id"])) < 1e-9
    assert [r["rank"] for r in got] == [1, 2, 3]


def test_charlm_perplexity_matches_python_lm(spark):
    import math
    from collections import Counter

    from smart_crawler_spark.operators.textops import charlm_perplexity

    corpus = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the the the the the the"),
        (2, "zq xv jk qz vx kj zq xv"),
        (3, "a normal english sentence reads easily"),
        (4, "ab"),  # shorter than n=3 after norm -> dropped
        # english must DOMINATE the training mix for the ppl ordering
        # to mean anything (as it does in a real corpus): with only one
        # english doc, every english trigram is as rare as gibberish
        (5, "more ordinary english text keeps the language model honest"),
        (6, "sentences with common words train the character model well"),
        (7, "reading and writing english is the bread and butter here"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in charlm_perplexity(docs).collect()}
    assert 4 not in got

    def norm(s):
        out = "".join(c if c.islower() or c.isdigit() or c == " " else " "
                      for c in s.lower())
        return " ".join(out.split())

    texts = {d: norm(t) for d, t in corpus}
    cn = Counter(g for t in texts.values() if len(t) >= 3
                 for g in (t[i:i+3] for i in range(len(t) - 2)))
    cc = Counter()
    for g, c in cn.items():
        cc[g[:2]] += c
    for d, t in texts.items():
        if len(t) < 3:
            continue
        grams = [t[i:i+3] for i in range(len(t) - 2)]
        lps = [math.log((cn[g] + 0.5) / (cc[g[:2]] + 0.5 * 37))
               for g in grams]
        want = round(math.exp(-sum(lps) / len(lps)), 4)
        assert got[d]["n_ngrams"] == len(grams)
        assert abs(got[d]["ppl"] - want) < 1e-9, (d, got[d]["ppl"], want)
    # repetitive text is LOW perplexity, gibberish HIGH
    assert got[1]["ppl"] < got[3]["ppl"] < got[2]["ppl"]


def _py_winnow(text, width, window):
    import hashlib

    t = " ".join(
        "".join(c if (c.islower() or c.isdigit() or c == " ") else " "
                for c in text.lower()).split()
    )
    if len(t) < width:
        return set()
    hs = [
        int(hashlib.md5(t[i:i + width].encode()).hexdigest()[:15], 16)
        for i in range(len(t) - width + 1)
    ]
    if len(hs) < window:
        return {min(hs)}
    return {min(hs[j:j + window]) for j in range(len(hs) - window + 1)}


def test_winnow_fingerprints_match_python_replay(spark):
    from smart_crawler_spark.operators.textops import winnow_fingerprints

    texts = [
        (0, "The quick brown fox jumps over the lazy dog near the bank."),
        (1, "shrt"),
        (2, "a" * 25),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = winnow_fingerprints(df, width=20, window=5).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    for d, t in texts:
        want = _py_winnow(t, 20, 5)
        assert by_doc.get(d, set()) == want, d


def test_substring_dup_detects_offset_shifted_passage(spark):
    """The winnowing guarantee: a shared passage >= width+window-1
    chars is found even at different offsets in the two docs; unrelated
    docs and passages over the frequency cap produce no pairs."""
    from smart_crawler_spark.operators.textops import substring_dup_pairs

    passage = "the verbatim quoted block of text appears in both documents"
    boiler = "standard footer line repeated across every page of the site"
    rows = [
        (0, "intro words before it " + passage + " and a tail"),
        (1, "x " + passage + " completely different ending words here"),
        (2, "nothing in common with anybody else at all in this one"),
        # 3-6 share only the boilerplate passage (over the cap of 3)
        (3, "aa " + boiler), (4, "bbbb " + boiler),
        (5, "cccccc " + boiler), (6, "dddddddd " + boiler),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in substring_dup_pairs(
            df, width=20, window=5, max_bucket=3
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert all(a == 0 and b == 1 for a, b in pairs), pairs


def test_dsir_weights_match_python_model(spark):
    """Exact replay of the hashed two-LM importance weight: md5 feature
    buckets, add-alpha smoothing, per-doc log-ratio sum — and the
    directional property (target-like docs score higher than raw-only
    docs)."""
    import hashlib
    import math
    import re

    from smart_crawler_spark.operators.textops import dsir_weights

    rows = [
        (0, "alpha beta alpha gamma", True),
        (1, "alpha beta beta", True),
        (2, "gamma delta epsilon zeta", False),
        (3, "alpha beta alpha beta", False),  # target-like raw doc
        (4, "delta zeta zeta epsilon", False),
        (5, "!!!", False),  # zero tokens -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    n_buckets, alpha = 64, 0.5

    def bkt(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n_buckets

    toks = [
        (d, t, bkt(w))
        for d, text, t in rows
        for w in re.split(r"[^a-z0-9]+", text.lower())
        if w
    ]
    tr, tt = len(toks), sum(1 for _, t, _ in toks if t)
    cr, ct = {}, {}
    for _, t, b in toks:
        cr[b] = cr.get(b, 0) + 1
        if t:
            ct[b] = ct.get(b, 0) + 1
    want = {}
    for d, _, b in toks:
        lr = math.log((ct.get(b, 0) + alpha) / (tt + alpha * n_buckets)) - \
            math.log((cr[b] + alpha) / (tr + alpha * n_buckets))
        want[d] = want.get(d, 0.0) + lr
    got = {
        r["doc_id"]: r
        for r in dsir_weights(
            docs, F.col("tgt"), n_buckets=n_buckets, alpha=alpha
        ).collect()
    }
    assert set(got) == set(want)
    for d, w in want.items():
        assert got[d]["logw"] == round(w, 4), d
    # target-vocabulary doc outranks raw-only doc even though neither
    # is in the target slice
    assert got[3]["logw"] > got[4]["logw"]


def test_heavy_hitters_exact_under_eviction(spark):
    """Misra-Gries pass-1 with capacity << vocabulary must still
    surface every genuinely heavy term (pigeonhole guarantee), and the
    exact pass-2 recount makes the final top-k equal direct counting —
    on a Zipf-ish corpus with 400+ singleton tail terms and capacity
    32, spread over 4 partitions."""
    from collections import Counter

    from smart_crawler_spark.operators.textops import heavy_hitters_topk

    toks = []
    for i in range(10):  # heavy heads: 120, 110, ... 30 occurrences
        toks += [f"head{i}"] * (120 - 10 * i)
    toks += [f"tail{j}" for j in range(400)]  # singleton tail
    toks += [f"mid{j}" for j in range(50) for _ in range(2)]  # count-2 mid
    rng_docs = [
        (d, " ".join(toks[d::16])) for d in range(16)  # stripe into docs
    ]
    docs = spark.createDataFrame(
        rng_docs, "doc_id long, text string"
    ).repartition(4)
    got = [
        (r["term"], r["n"], r["rank"])
        for r in heavy_hitters_topk(docs, k=10, capacity=32)
        .orderBy("rank")
        .collect()
    ]
    counts = Counter(toks)
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [(t, n, i + 1) for i, (t, n) in enumerate(want)]


def test_quality_gate_drop_reasons(spark):
    """Each gate dimension drops independently: wrong language, low
    quality (shouting), repeated trigrams, too short — and a clean doc
    passes."""
    from smart_crawler_spark.operators.textops import quality_gate

    def filler(i):  # unique alphabetic word per index
        return f"x{chr(97 + i // 26)}{chr(97 + i % 26)}"

    # 130 words, en stopwords every 5th slot, all trigrams distinct
    good = " ".join(
        ("the" if i % 10 == 0 else "and" if i % 10 == 5 else filler(i))
        for i in range(130)
    )
    fr = " ".join(  # only FRENCH stopwords between unique fillers
        (["le", "la", "et", "les", "des"][i % 10] if i % 10 < 5
         else filler(200 + i))
        for i in range(40)
    )
    rows = [
        (0, good),  # keeps: en, long enough, clean
        (1, fr),  # wrong language
        (2, ("spam ham " * 30).strip()),  # dup trigrams
        (3, "the end"),  # too short
        (4, good.upper() + " !!!!!" * 40),  # shouting + punct spam
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in quality_gate(
            docs, min_quality=0.75, max_dup_trigram=0.2, min_words=20
        ).collect()
    }
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False and got[1]["pred_lang"] == "fr"
    assert got[2]["keep"] is False and got[2]["dup_trigram_frac"] > 0.2
    assert got[3]["keep"] is False and got[3]["n_words"] < 20
    assert got[4]["keep"] is False and got[4]["quality"] < 0.75


def test_extract_main_text_strips_blocks_tags_entities(spark):
    from smart_crawler_spark.operators.textops import extract_main_text

    rows = [
        (1, "<html><head><title>T</title><style>a{b}</style></head>"
            "<body><p>Hello   world</p></body></html>", "Hello world"),
        (2, "<body><script>\nif (a < b) { x(); }\n</script>Keep "
            "<b>bold</b> text</body>", "Keep bold text"),
        (3, "<p>5 &lt; 6 &amp;&amp; 7 &gt; 2</p>", "5 < 6 && 7 > 2"),
        # double-encoded entity must decode ONE level only
        (4, "<p>&amp;lt;tag&amp;gt;</p>", "&lt;tag&gt;"),
        (5, "a<!-- hidden\nmultiline -->b", "a b"),
        (6, "<div class='x'  data-k=\"v\">inner</div>", "inner"),
        (7, "no markup at all", "no markup at all"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in rows], "doc_id long, html string"
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in extract_main_text(df).collect()
    }
    for i, _, want in rows:
        assert got[i] == want, (i, got[i])


def test_unicode_dedup_forms_and_case_merge(spark):
    """Composed, decomposed, and uppercase variants of one text merge;
    distinct texts never do; byte-equal duplicates still group."""
    from smart_crawler_spark.operators.textops import unicode_dedup

    rows = [
        (0, "Caf\u00e9 au lait"),          # composed
        (1, "Cafe\u0301 au lait"),         # decomposed
        (2, "CAF\u00c9 AU LAIT"),          # uppercase composed
        (3, "completely different"),
        (4, "completely different"),        # byte dup of 3
        (5, "caf\u00e9 noir"),             # same word, different text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["group_id"], r["n_docs"])
        for r in unicode_dedup(df).collect()
    }
    assert got == {
        (0, 0, 3), (1, 0, 3), (2, 0, 3),
        (3, 3, 2), (4, 3, 2),
    }


def test_phrase_search_overlaps_and_multiword(spark):
    """Overlapping occurrences each count (distinct start positions);
    a 3-word phrase needs two positional joins; no-match docs are
    absent; matching is case-insensitive."""
    from smart_crawler_spark.operators.textops import phrase_search

    docs = spark.createDataFrame(
        [
            (0, "a a a a b"),          # 'a a a' at starts 0 and 1
            (1, "x A a A y"),          # case-insensitive single match
            (2, "a b a b a"),          # no adjacent run
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["n_matches"])
        for r in phrase_search(docs, "A a a").collect()
    }
    assert got == {(0, 2), (1, 1)}


def test_fielded_bm25_anchor_boost_and_reference_formula(spark):
    """BM25F semantics: (1) a doc whose BODY lacks the term but whose
    inbound anchors carry it outranks a weak body match (the anchor
    signal is live, not decorative); (2) anchor repetition saturates
    JOINTLY with body tf (shared k1 denominator); (3) zero-anchor docs
    score body-only; (4) every score equals a pure-Python replay of
    the Robertson BM25F formula."""
    import math

    from smart_crawler_spark.operators.textops import fielded_bm25

    bodies = {
        0: "spark overview and internals",      # weak body match
        1: "storage engine notes",              # no body match, anchors below
        2: "spark spark spark deep dive",       # heavy body repetition
        3: "unrelated prose entirely",          # nothing anywhere
    }
    anchor_rows = [
        (1, "spark guide"),
        (1, "the spark page"),
        (1, "spark"),
        (2, "spark"),
    ]
    docs = spark.createDataFrame(
        list(bodies.items()), "doc_id long, text string"
    )
    anchors = spark.createDataFrame(anchor_rows, "doc_id long, anchor string")
    got = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in fielded_bm25(
            docs, anchors, ["spark"], k=10
        ).collect()
    }
    # python replay
    tok = lambda s: [w for w in __import__("re").split(r"[^a-z0-9]+", s.lower()) if w]
    tf_b = {d: tok(t).count("spark") for d, t in bodies.items()}
    tf_a = {d: 0 for d in bodies}
    dl_a = {d: 0 for d in bodies}
    for d, a in anchor_rows:
        tf_a[d] += tok(a).count("spark")
        dl_a[d] += len(tok(a))
    dl_b = {d: len(tok(t)) for d, t in bodies.items()}
    n = len(bodies)
    avg_b = sum(dl_b.values()) / n
    avg_a = sum(dl_a.values()) / n
    df = sum(1 for d in bodies if tf_b[d] or tf_a[d])
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    want = {}
    for d in bodies:
        if not (tf_b[d] or tf_a[d]):
            continue
        nb = 1 - 0.75 + 0.75 * dl_b[d] / avg_b
        na = (1 - 0.75 + 0.75 * dl_a[d] / avg_a) if avg_a > 0 else 1.0
        tfc = 1.0 * tf_b[d] / nb + 2.0 * tf_a[d] / na
        want[d] = round(idf * tfc / (1.2 + tfc), 4)
    assert {d: s for d, (s, _) in got.items()} == want
    # the anchor-only doc outranks the weak body match
    assert got[1][1] < got[0][1]
    # nothing-anywhere doc is absent
    assert 3 not in got


def test_substring_dup_exact_verify_property(spark):
    """Two-pass exact verify (substring_dup_exact): random corpora with
    planted passages of lengths straddling the winnowing guarantee
    band [width, width+window-2]. Ground truth is a brute-force Python
    LCS over ALL candidate pairs: the verified output must equal
    {candidates with true LCS >= width} with EXACT lcs_len — including
    the near-miss band where winnowing's n_shared alone proves nothing
    about passage length."""
    import itertools
    import random

    from smart_crawler_spark.operators.textops import (
        substring_dup_exact,
        substring_dup_pairs,
    )

    WIDTH, WINDOW = 20, 8

    def norm(s):
        import re

        return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", s.lower())).strip()

    def py_lcs(a, b):
        if len(a) > len(b):
            a, b = b, a
        lo, hi = 0, len(a)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            grams = {a[i : i + mid] for i in range(len(a) - mid + 1)}
            if any(b[j : j + mid] in grams for j in range(len(b) - mid + 1)):
                lo = mid
            else:
                hi = mid - 1
        return lo

    for trial in (0, 1):
        rng = random.Random(100 + trial)
        alpha = "abcdefghij"

        def blob(n):
            return "".join(rng.choice(alpha) for _ in range(n))

        texts = {i: blob(rng.randint(120, 240)) for i in range(10)}
        # plant passages across the guarantee band: below width (must
        # never verify), the near-miss band [width, width+window-2]
        # (winnowing MAY flag — exact length must come out right), and
        # above the guarantee (always flagged, exact length checked)
        for (da, db), plen in [
            ((0, 1), WIDTH - 3),
            ((2, 3), WIDTH + 2),          # near-miss band
            ((4, 5), WIDTH + WINDOW - 2), # top of the band
            ((6, 7), WIDTH + WINDOW + 9), # guaranteed detection
        ]:
            p = blob(plen)
            ta, tb = texts[da], texts[db]
            ia = rng.randint(0, len(ta) - 1)
            ib = rng.randint(0, len(tb) - 1)
            texts[da] = ta[:ia] + p + ta[ia:]
            texts[db] = tb[:ib] + p + tb[ib:]
        docs = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        cands = {
            (r["id_a"], r["id_b"])
            for r in substring_dup_pairs(
                docs, width=WIDTH, window=WINDOW
            ).collect()
        }
        got = {
            (r["id_a"], r["id_b"]): (r["n_shared"], r["lcs_len"])
            for r in substring_dup_exact(
                docs, width=WIDTH, window=WINDOW
            ).collect()
        }
        # ground truth over candidates (the verify pass never adds
        # pairs winnowing didn't flag — exact over candidates only)
        truth = {
            pair: py_lcs(norm(texts[pair[0]]), norm(texts[pair[1]]))
            for pair in cands
        }
        assert set(got) == {p for p, l in truth.items() if l >= WIDTH}
        for pair, (_ns, lcs) in got.items():
            assert lcs == truth[pair], (pair, lcs, truth[pair])
        # the guaranteed plant is flagged AND exactly measured
        assert (6, 7) in got
        assert got[(6, 7)][1] >= WIDTH + WINDOW + 9
        # sub-width plants never verify
        assert (0, 1) not in got


def test_dup_passage_scrub_removes_later_occurrences(spark):
    """Lee-et-al-style passage REMOVAL: the occurrence survives only in
    the smallest doc id; chains collapse; untouched docs pass through;
    removal counts are exact; all against a pure-Python mirror of the
    removal rule (canonical passage = lexicographically smallest
    maximal common substring, applied ascending)."""
    import re

    from smart_crawler_spark.operators.textops import (
        _lcs_of,
        dup_passage_scrub,
        substring_dup_exact,
    )

    def norm(s):
        return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", s.lower())).strip()

    P = "the quick brown fox jumps over the lazy dog tonight"
    texts = {
        0: f"alpha bravo {P} charlie delta echo foxtrot golf hotel india",
        1: f"india juliet kilo {P} lima mike november oscar papa quebec",
        2: f"{P} romeo sierra tango uniform victor whiskey xray yankee",
        3: "completely unrelated prose with no shared passages at all here",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    W, WIN = 20, 8
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dup_passage_scrub(docs, width=W, window=WIN).collect()
    }
    assert set(got) == set(texts)
    # python mirror
    pairs = {
        (r["id_a"], r["id_b"]): None
        for r in substring_dup_exact(docs, width=W, window=WIN).collect()
    }
    removal: dict[int, set] = {}
    for a, b in pairs:
        _L, p = _lcs_of(norm(texts[a]), norm(texts[b]))
        removal.setdefault(b, set()).add(p)
    for d, t in texts.items():
        n = norm(t)
        expect = n
        for p in sorted(removal.get(d, ())):
            expect = expect.replace(p, "")
        assert got[d][0] == expect, d
        assert got[d][1] == len(n) - len(expect), d
    # the chain collapsed: only doc 0 still contains the passage
    shared = norm(P)
    assert shared in got[0][0]
    assert shared not in got[1][0] and shared not in got[2][0]
    # untouched doc passes through unmodified
    assert got[3] == (norm(texts[3]), 0)
