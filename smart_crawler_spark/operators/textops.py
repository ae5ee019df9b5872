"""Text-analysis operators for a training-data pipeline, all expressed
as native Catalyst column expressions (JVM-side, whole-stage codegen —
no Python in the hot path). Each has a DuckDB-SQL oracle in
``__spark_entry__.py``.

Operators: exact dedup (hash-groupBy), n-gram/word-set Jaccard near-dup
pair join, token counting (whitespace + BPE-ish regex), language-ID
heuristic, quality scoring, document fingerprinting, within-document
repetition stats (duplicate n-gram fractions, Gopher-rule family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# token regex shared with the oracle SQL: word runs or single non-space
# punctuation — a BPE-ish pre-tokenizer split.
TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
}


def md5_hash32(col: Column | str) -> Column:
    """First 8 hex digits of md5(key) as a long in [0, 2^32) — the
    engine-reproducible uniform draw shared by every deterministic
    sampling/layout operator (stratified_sample, sequence_pack).
    DuckDB replays it as ``('0x' || substr(md5(key), 1, 8))::BIGINT``;
    keep the two dialects in sync HERE, not per operator."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def normalized_text(col: Column | str) -> Column:
    """Lowercase + whitespace-collapse + trim — the dedup identity
    (mirrors the reference's record normalization,
    ``util/XPathUtils.java:223-225``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by md5 of normalized text; keeps the lowest
    id as the canonical representative. Scales as one hash aggregation
    (map-side partial agg; no window over the full corpus)."""
    return (
        docs.select(
            F.col(id_col), F.md5(normalized_text(text_col)).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def word_set(col: Column | str) -> Column:
    """Distinct lowercase word tokens as a sorted array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda w: w != "")
        )
    )


def jaccard_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs word-set Jaccard similarity >= threshold (i < j).

    This is the *exact* small-scale path (the C3 distance join of the
    modeler, re-used for document near-dup). The scale path is
    ``minhash.lsh_near_dup_pairs`` — candidate pairs from banded MinHash
    instead of a cross join.
    """
    a = docs.select(
        F.col(id_col).alias("id_a"), word_set(text_col).alias("ws_a")
    )
    b = docs.select(
        F.col(id_col).alias("id_b"), word_set(text_col).alias("ws_b")
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("ws_a", "ws_b"))
    union = F.size(F.array_union("ws_a", "ws_b"))
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        pairs.select(
            "id_a", "id_b", F.round(sim, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _word_list(col: Column | str) -> Column:
    """Ordered (non-distinct) lowercase word tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda w: w != "")


def _ngrams(words: Column, n: int) -> Column:
    """Overlapping word n-grams as space-joined strings (empty array
    below n words — guards Spark's descending sequence(1,0))."""
    if n == 1:
        return words
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k) for k in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals for quality filtering (the
    Gopher-rules family: fraction of duplicate uni/bi/tri-grams).
    A high duplicate-n-gram fraction marks boilerplate/spam pages.

    Linear per document (array_distinct, no quadratic top-n-gram scan)
    and pure Catalyst higher-order functions — whole-stage codegen, no
    Python, no shuffle: scales as a map-only pass over the corpus."""

    def dup_frac(g: Column) -> Column:
        return F.round(
            F.when(
                F.size(g) > 0,
                F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g),
            ).otherwise(F.lit(0.0)),
            6,
        )

    words = _word_list(text_col)
    return docs.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        dup_frac(words).alias("dup_word_frac"),
        dup_frac(_ngrams(words, 2)).alias("dup_bigram_frac"),
        dup_frac(_ngrams(words, 3)).alias("dup_trigram_frac"),
    )


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at least
    one word ``n``-gram (default 13, the WMDP/GPT-3-style window) with a
    benchmark set. Returns one row per document: ``(id, n_hits,
    contaminated)`` where ``n_hits`` counts the DISTINCT benchmark
    n-grams the document contains.

    Scale design (100 TB corpus, MB-scale benchmark): the benchmark
    n-gram set is tiny relative to the corpus, so the hit probe is a
    BROADCAST hash join on the 16-byte md5 of each gram — the corpus
    side is map-only (per-document grams are deduped with
    ``array_distinct`` BEFORE the explode, so no corpus-sized shuffle
    ever carries gram rows). Only the matched hits (rare) shuffle for
    the per-document count, and that small hit table is broadcast back
    onto the corpus for the zero-hit rows. No cross join anywhere
    (plan-pinned in tests/test_textops.py).
    """
    bench_grams = (
        bench.select(
            F.explode(
                F.array_distinct(_ngrams(_word_list(bench_text_col), n))
            ).alias("gram")
        )
        .select(F.md5("gram").alias("gh"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_ngrams(_word_list(text_col), n))
        ).alias("gram"),
    ).select(id_col, F.md5("gram").alias("gh"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return docs.select(id_col).join(
        F.broadcast(hits), id_col, "left"
    ).select(
        F.col(id_col),
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
    )


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + chars."""
    return docs.select(
        F.col(id_col),
        F.size(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
        ).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)).alias("bpe_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language heuristic: score per language = number of
    stopword types present; argmax wins ('und' = undetermined on tie-0).

    Pure column expressions so it runs JVM-side over 100 TB of text.
    """
    ws = word_set(text_col)
    out = docs.select(F.col(id_col), ws.alias("_ws"))
    for lang, words in STOPWORDS.items():
        hits = F.size(
            F.array_intersect(
                "_ws", F.array(*[F.lit(w) for w in words])
            )
        )
        out = out.withColumn(f"score_{lang}", hits)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in langs:  # first max wins, in fixed language order
        pred = pred.when(F.col(f"score_{lg}") == best, F.lit(lg))
    return out.select(
        id_col, *[f"score_{lg}" for lg in langs], pred.alias("pred_lang")
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality: length, punctuation ratio, mean word
    length, uppercase ratio → one [0,1] score. All JVM-side."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    upper_ratio = F.when(n_alpha > 0, n_upper / n_alpha).otherwise(0.0)
    mean_wlen = F.when(n_words > 0, n_chars / n_words).otherwise(0.0)
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + alpha_ratio * 0.3
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
        + (1 - upper_ratio) * 0.1
    )
    return docs.select(
        F.col(id_col),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of normalized text + first-8-hex prefix
    bucket (cheap shard key for fingerprint joins)."""
    fp = F.md5(normalized_text(text_col))
    return docs.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fp_bucket"),
    )


def sequence_pack(
    docs: DataFrame,
    budget: int,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget sequence packing (concat-and-chunk): lay the corpus
    out as ONE deterministic token stream — documents ordered by
    (md5-bucket, id) — and split it into fixed-``budget`` training
    sequences. Emits, per document, the sequence it starts in, its token
    offset there, and whether it straddles a sequence boundary (the
    cross-attention-mask case a packer has to know about).

    The global prefix sum is TWO-PHASE so no window ever sees the corpus
    in one partition: (1) a per-bucket cumulative sum — each md5-derived
    bucket is an independent window partition; (2) a bucket-offset
    table, ``n_buckets`` rows, cumulated in a single tiny window and
    broadcast back. At 100 TB all corpus-sized work stays parallel; the
    serial step touches 64 rows. The md5 bucketing (not xxhash) keeps
    the stream order engine-reproducible, so the DuckDB oracle replays
    the identical layout with one flat window cumsum.
    """
    ntok = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    ).cast("long")
    bucket = md5_hash32(id_col) % n_buckets
    base = docs.select(
        F.col(id_col), bucket.alias("bucket"), ntok.alias("n_tokens")
    )
    in_bucket = Window.partitionBy("bucket").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    within = base.withColumn(
        "_pre", F.coalesce(F.sum("n_tokens").over(in_bucket), F.lit(0))
    )
    # one row per bucket; the only non-partitioned window in the plan
    across = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        base.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("_btok"))
        .select(
            "bucket",
            F.coalesce(F.sum("_btok").over(across), F.lit(0)).alias("_boff"),
        )
    )
    start = F.col("_boff") + F.col("_pre")
    end = start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return (
        within.join(F.broadcast(offsets), "bucket")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.floor(start / budget).alias("seq_id"),
            (start % budget).alias("seq_offset"),
            (F.floor(end / budget) > F.floor(start / budget)).alias(
                "straddles"
            ),
        )
    )


# Encoding-quality patterns shared with the oracle SQL. Engine-agnostic
# by construction: the control-char class uses only two-digit \xNN
# escapes (identical in java.util.regex and RE2) and the mojibake
# pattern is a pure alternation of LITERAL characters (the classic
# UTF-8-decoded-as-Latin-1 two-byte artifacts, plus the replacement
# char's own mojibake 'ï¿½') — no escapes at all.
ENC_REPLACEMENT_CHAR = "�"
ENC_CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
ENC_MOJIBAKE_RE = "Ã©|Ã¨|Ã¼|Ã±|Ã¤|Ã¶|â€™|â€œ|â€“|Â·|Â»|ï¿½"


def encoding_quality(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Encoding-health stats for a crawled corpus — the FineWeb-style
    pre-filter that catches decode damage before any tokenizer sees it:
    U+FFFD replacement characters (a decoder already gave up), raw C0/C1
    control characters (binary leaking into text), and mojibake markers
    (UTF-8 bytes re-decoded as Latin-1, e.g. 'Ã©' where 'é' belongs).

    keep = no replacement chars AND no control chars AND mojibake
    markers under 1 per 100 chars. Pure Catalyst `regexp_count` — JVM,
    map-only, whole-stage codegen, zero shuffles at 100 TB. The three
    patterns are module constants shared verbatim with the DuckDB
    oracle (literal alternations + \\xNN classes parse identically in
    java.util.regex and RE2)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_repl = F.regexp_count(t, F.lit(ENC_REPLACEMENT_CHAR))
    n_ctrl = F.regexp_count(t, F.lit(ENC_CTRL_RE))
    n_moji = F.regexp_count(t, F.lit(ENC_MOJIBAKE_RE))
    keep = (n_repl == 0) & (n_ctrl == 0) & (n_moji * 100 <= n_chars)
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_repl.cast("int").alias("n_replacement"),
        n_ctrl.cast("int").alias("n_ctrl"),
        n_moji.cast("int").alias("n_mojibake"),
        keep.alias("keep"),
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-distribution Shannon entropy per document (nats) — the
    gibberish/keyboard-mash/base64-blob detector that complements
    ``charlm_perplexity``: perplexity needs a corpus-trained LM, entropy
    is intrinsic to the document, so it runs in the FIRST pass before
    any corpus statistics exist. Very low entropy = repeated-character
    spam; very high (near ln alphabet) = uniform noise / encoded blobs.

    Computed as ln(N) - sum(c*ln c)/N over per-character counts of the
    charlm-normalized text — entirely with Catalyst higher-order
    functions (sequence/substr char explode is ARRAY-side, distinct +
    per-char filter counts are O(len * alphabet) with alphabet <= 37):
    map-only, zero shuffles, zero Python. The same normalization as
    charlm_perplexity keeps the two quality signals comparable.

    Output: (id, n_chars, n_distinct, entropy) — entropy rounded 6 dp;
    empty normalized texts are dropped (entropy undefined)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    base = docs.select(F.col(id_col), norm.alias("t")).filter(
        F.length("t") > 0
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("t")),
        lambda i: F.col("t").substr(i, F.lit(1)),
    )
    uniq = F.array_distinct(chars)
    counts = F.transform(
        uniq,
        lambda u: F.size(F.filter(chars, lambda c: c == u)).cast("double"),
    )
    n = F.length("t").cast("double")
    s = F.aggregate(
        counts, F.lit(0.0), lambda acc, c: acc + c * F.log(c)
    )
    return base.select(
        id_col,
        F.length("t").cast("long").alias("n_chars"),
        F.size(uniq).cast("int").alias("n_distinct"),
        F.round(F.log(n) - s / n, 6).alias("entropy"),
    )


def truncation_pairs(
    docs: DataFrame,
    prefix_len: int = 64,
    max_bucket: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Prefix-containment dedup: find (short, long) document pairs where
    the short doc's full normalized text is a strict PREFIX of the long
    doc's — the truncated-scrape / pagination-cutoff duplicate family
    that whole-doc hashes miss (different lengths → different hashes)
    and similarity sketches dilute when the long doc keeps going.

    Scale shape: candidates come from an equi-join on the md5 of the
    first ``prefix_len`` normalized chars — any true pair (short side
    >= prefix_len chars) shares that key by definition, so only (id,
    16-byte key, length) rows shuffle. A frequency cap drops keys shared
    by > ``max_bucket`` docs before the self-join (a hot shared opening
    is template boilerplate — template_cap/line_dedup territory — and
    would pair quadratically). Verification is one substring equality
    per candidate; strict ``len_short < len_long`` excludes exact dups
    (exact_dedup's job). No cartesian, no window.

    Output: (id_short, id_long, short_len, long_len)."""
    base = docs.select(
        F.col(id_col).alias("id"), normalized_text(text_col).alias("t")
    ).filter(F.length("t") >= prefix_len)
    keyed = base.select(
        "id",
        "t",
        F.length("t").cast("long").alias("len"),
        F.md5(F.substring("t", 1, prefix_len)).alias("pk"),
    )
    ok = (
        keyed.groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= max_bucket)
        .select("pk")
    )
    keyed = keyed.join(ok, "pk")
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, "pk")
        .filter(F.col("a.len") < F.col("b.len"))
        .filter(
            F.col("b.t").substr(F.lit(1), F.col("a.len")) == F.col("a.t")
        )
        .select(
            F.col("a.id").alias("id_short"),
            F.col("b.id").alias("id_long"),
            F.col("a.len").alias("short_len"),
            F.col("b.len").alias("long_len"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical all-pairs similarity: tf-idf cosine >= threshold via an
    inverted-index self-join (Bayardo, Ma & Srikant, WWW'07 "Scaling Up
    All Pairs Similarity Search") — the THIRD similarity family next to
    shingle sketches (MinHash/SimHash: set overlap, order-blind) and
    embeddings (semantic): idf weighting finds docs sharing RARE
    vocabulary, the plagiarism/mirror signal the other two dilute.

    Scale shape: candidates come from the inverted index — only (term,
    id, weight) rows shuffle, pairs materialize per shared term via an
    equi-join on the term, and the per-pair partial dot products
    aggregate map-side. The quadratic hot-key risk is capped by
    ``max_df``: terms in more than ``max_df`` docs are dropped BEFORE
    the join (a term shared by half the corpus is a stopword — it
    carries ~zero idf mass by construction, so the cap changes recall
    only at the threshold margin; same guard as substring_dup_pairs).
    idf = ln(N/df) plain (no smoothing) so the SQL oracle is exact;
    norms use ONLY surviving terms, keeping both engines on the same
    vector. No cartesian, no window over the corpus.

    Output: (id_a, id_b, cosine) with cosine rounded 6 dp, id_a < id_b."""
    n_docs = docs.count()
    tf = (
        docs.select(F.col(id_col), F.explode(_word_list(text_col)).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_t = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("w", F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf"))
    )
    wt = tf.join(df_t, "w").select(
        "w", F.col(id_col).alias("id"), (F.col("tf") * F.col("idf")).alias("wgt")
    )
    norms = wt.groupBy("id").agg(
        F.sqrt(F.sum(F.col("wgt") * F.col("wgt"))).alias("nrm")
    )
    a, b = wt.alias("a"), wt.alias("b")
    dots = (
        a.join(b, "w")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.col("a.wgt") * F.col("b.wgt")).alias("dot"))
    )
    return (
        dots.join(norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("_na")), "id_a")
        .join(norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("_nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("_na") * F.col("_nb")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


# PII patterns shared with the oracle SQL: conservative, RE2-compatible
# (DuckDB) AND java.util.regex-compatible (Spark) — no lookarounds, no
# \b ambiguity across engines beyond word chars.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction for training corpora: replace emails, NANP-style
    phone numbers, and IPv4 addresses with typed placeholder tokens and
    count each redaction. Pure Catalyst `regexp_replace`/`regexp_count`
    (JVM, map-only, whole-stage codegen — streams over 100 TB with zero
    shuffles); the patterns are the module constants above so the DuckDB
    oracle replays the identical regexes. IPs are redacted before phones
    (a phone pattern can never match inside an IP with these regexes,
    but a fixed order keeps the composition deterministic)."""
    c = F.col(text_col)
    n_emails = F.regexp_count(c, F.lit(PII_EMAIL_RE))
    n_ips = F.regexp_count(c, F.lit(PII_IPV4_RE))
    n_phones = F.regexp_count(c, F.lit(PII_PHONE_RE))
    clean = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_IPV4_RE, "<IP>")
    clean = F.regexp_replace(clean, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"),
        n_ips.cast("int").alias("n_ips"),
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Cross-document line-level dedup (RefinedWeb/Falcon-style): a line
    occurring in >= ``min_docs`` distinct documents is boilerplate;
    remove it from every document and report per-doc stats. Two hash
    aggregations over exploded lines (both map-side-partial, keyed by a
    64-bit line hash — never the line text) and one equi-join back;
    no window over the corpus, no Python. At 100 TB the line-hash
    frequency table is orders of magnitude smaller than the corpus
    (only lines, counted once per doc) and the join key is the hash.

    Output: (id, n_lines, dup_lines, dup_frac, clean_text) where
    clean_text keeps the doc's non-boilerplate lines in order."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_no", "line"),
    ).withColumn("line_hash", F.xxhash64("line"))
    boiler = (
        lines.groupBy("line_hash")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line_hash", F.lit(True).alias("is_dup"))
    )
    marked = lines.join(boiler, "line_hash", "left").select(
        id_col,
        "line_no",
        "line",
        F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lines"),
        F.sum(F.col("is_dup").cast("int")).cast("int").alias("dup_lines"),
        F.round(
            F.sum(F.col("is_dup").cast("int")) / F.count(F.lit(1)), 6
        ).alias("dup_frac"),
        F.array_join(
            F.sort_array(
                F.collect_list(
                    F.when(
                        ~F.col("is_dup"),
                        F.struct("line_no", "line"),
                    )
                )
            ).getField("line"),
            sep,
        ).alias("clean_text"),
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 relevance top-k over a document corpus (Robertson/Sparck
    Jones probabilistic idf, the +1 'BM25+' form so idf stays positive).
    Shaped for scale: the exploded token stream is filtered to the
    query's terms BEFORE any aggregation (the per-(doc,term) tf table
    is |terms|-bounded, not vocabulary-bounded), document length comes
    from size(split(...)) without an explode, df/avgdl are map-side
    partial aggs, the |terms|-row idf table and the 1-row avgdl join
    back as broadcasts, and top-k plans as TakeOrderedAndProject —
    no corpus-wide sort, no window. Ties break on ascending id.

    Output: (id, score, rank) for the k highest-scoring docs."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("term"),
    ).filter(F.col("term").isin([t.lower() for t in terms]))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    dl = docs.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("dl"),
    )
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    idf = tf.groupBy("term").agg(
        F.count_distinct(id_col).alias("df")
    ).select(
        "term",
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        ).alias("idf"),
    )
    score_term = F.col("idf") * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl))
        .groupBy(id_col)
        .agg(F.round(F.sum(score_term), 4).alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            "score",
            F.row_number()
            .over(
                Window.orderBy(F.desc("score"), F.col(id_col).asc())
            )
            .alias("rank"),
        )
    )


def fielded_bm25(
    docs: DataFrame,
    anchors: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    body_weight: float = 1.0,
    anchor_weight: float = 2.0,
    b_body: float = 0.75,
    b_anchor: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    anchor_col: str = "anchor",
) -> DataFrame:
    """BM25F ranking over body text + inbound anchor text — the
    classic web-search signal (anchor text describes the TARGET better
    than its own text, Brin & Page 1998 §2.2; the fielded combination
    is Robertson, Zaragoza & Taylor CIKM 2004's simple BM25F). This is
    the consumer of ``anchor_text_agg``'s output the reference's
    singleton ClassLink captures implicitly (``model/ClassLink.java:
    50-72`` — a singleton link's anchor labels its destination class):

        tf~_f(d,t) = tf_f / (1 - b_f + b_f * dl_f / avgdl_f)
        tfc(d,t)   = w_body * tf~_body + w_anchor * tf~_anchor
        score(d)   = sum_t idf(t) * tfc / (k1 + tfc)

    — per-field length normalization FIRST, then one shared saturation
    (saturating per field and summing would let 1000 anchor repeats
    dominate; BM25F's point is that repetition saturates jointly).
    idf is document-frequency over EITHER field; a doc with no inbound
    anchors scores on body alone (anchor tf 0, anchor dl 0).

    ``anchors``: one row per inbound anchor (id_col, anchor_col) —
    ``anchor_text_agg`` output or the raw link table. Scale shape is
    bm25_topk's with one extra |terms|-bounded anchor-side tf branch:
    both token streams filter to the query terms BEFORE aggregation,
    field stats are map-side partial aggs joined back as broadcasts
    (|terms|- or 1-row), anchor dl aggregates per doc before joining,
    and top-k plans as TakeOrderedAndProject. No corpus-wide sort.

    Output: (id, score, rank) for the k highest-scoring docs, score
    rounded 4dp, ties on ascending id."""
    tset = [t.lower() for t in terms]
    tok = lambda c: F.filter(  # noqa: E731
        F.split(F.lower(c), r"[^a-z0-9]+"), lambda x: x != ""
    )
    body_toks = docs.select(
        F.col(id_col), F.explode(tok(F.col(text_col))).alias("term")
    ).filter(F.col("term").isin(tset))
    anch_words = anchors.select(
        F.col(id_col), tok(F.col(anchor_col)).alias("ws")
    )
    anch_toks = anch_words.select(
        id_col, F.explode("ws").alias("term")
    ).filter(F.col("term").isin(tset))

    tf_b = body_toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf_b")
    )
    tf_a = anch_toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf_a")
    )
    n_docs = docs.count()
    dl_b = docs.select(
        F.col(id_col), F.size(tok(F.col(text_col))).alias("dl_b")
    )
    # anchor field length PER DOC (sum over its inbound anchors),
    # aggregated before any join; zero-anchor docs get 0 via the left
    # join + coalesce below
    dl_a = anch_words.groupBy(id_col).agg(
        F.sum(F.size("ws")).alias("dl_a")
    )
    dl = dl_b.join(dl_a, id_col, "left").select(
        id_col, "dl_b", F.coalesce("dl_a", F.lit(0)).alias("dl_a")
    )
    # avgdl_anchor averages over ALL docs (zero-anchor docs count as
    # length 0) so the normalizer is corpus-stable, not
    # anchored-subset-stable
    avgdl = dl.agg(
        F.avg("dl_b").alias("avgdl_b"), F.avg("dl_a").alias("avgdl_a")
    )
    tf = (
        tf_b.join(tf_a, [id_col, "term"], "full_outer")
        .select(
            id_col,
            "term",
            F.coalesce("tf_b", F.lit(0)).alias("tf_b"),
            F.coalesce("tf_a", F.lit(0)).alias("tf_a"),
        )
    )
    idf = tf.groupBy("term").agg(
        F.count_distinct(id_col).alias("df")
    ).select(
        "term",
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        ).alias("idf"),
    )
    norm_b = F.lit(1 - b_body) + F.lit(b_body) * F.col("dl_b") / F.col(
        "avgdl_b"
    )
    norm_a = F.when(
        F.col("avgdl_a") > 0,
        F.lit(1 - b_anchor)
        + F.lit(b_anchor) * F.col("dl_a") / F.col("avgdl_a"),
    ).otherwise(F.lit(1.0))
    tfc = (
        F.lit(body_weight) * F.col("tf_b") / norm_b
        + F.lit(anchor_weight) * F.col("tf_a") / norm_a
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("idf") * tfc / (F.lit(k1) + tfc)), 4
            ).alias("score")
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            "score",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), F.col(id_col).asc()))
            .alias("rank"),
        )
    )


def charlm_perplexity(
    docs: DataFrame,
    n: int = 3,
    alpha: float = 0.5,
    alphabet_size: int = 37,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-n-gram LM perplexity scoring (the CCNet/Wikipedia-LM
    quality-filter family): train an add-alpha-smoothed char n-gram LM
    on the corpus, then score every document by the perplexity of its
    own characters under that LM. High-perplexity docs are gibberish /
    boilerplate / wrong-language; the score composes with
    ``quality_score`` as a filter column.

    Scale shape: n-gram extraction is a JVM ``transform`` over a
    character-index ``sequence`` (no Python, no self-join); the trained
    count table is VOCABULARY-bounded (<= alphabet_size**n rows, ~50k
    for trigrams — corpus-size-independent), so both the n-gram and
    context logprob tables join back as broadcasts; scoring is one
    explode + two broadcast joins + a per-doc partial aggregation.
    The only corpus-keyed shuffle is the final groupBy(id), and the
    training groupBy's output is vocab-bounded. Docs shorter than n
    normalized chars have no n-grams and are dropped (same rule as the
    SQL oracle).

    Output: (id, n_ngrams, ppl) with ppl rounded to 4 dp."""
    # normalization shared with the oracle: lower, non-[a-z0-9 ] -> ' ',
    # collapse runs, trim
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    grams = (
        docs.select(F.col(id_col), norm.alias("t"))
        .filter(F.length("t") >= n)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("t") - (n - 1)),
                    lambda i: F.col("t").substr(i, F.lit(n)),
                )
            ).alias("g"),
        )
    )
    cn = grams.groupBy("g").agg(F.count(F.lit(1)).cast("double").alias("cn"))
    cc = (
        cn.groupBy(F.substring("g", 1, n - 1).alias("ctx"))
        .agg(F.sum("cn").alias("cc"))
    )
    logp = cn.join(
        F.broadcast(cc), F.substring(cn["g"], 1, n - 1) == cc["ctx"]
    ).select(
        "g",
        F.log(
            (F.col("cn") + alpha) / (F.col("cc") + alpha * alphabet_size)
        ).alias("lp"),
    )
    return (
        grams.join(F.broadcast(logp), "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ngrams"),
            F.round(F.exp(-F.avg("lp")), 4).alias("ppl"),
        )
    )

def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 4096,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance-resampling weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by ``log p_target(doc) - log p_raw(doc)`` under two
    hashed bag-of-words models — the target model fit on the rows where
    ``is_target`` holds (e.g. a trusted high-quality slice), the raw
    model on the whole corpus. Sampling raw documents proportionally to
    ``exp(logw)`` shifts the corpus toward the target distribution; the
    weight column composes with ``stratified_sample``'s md5-threshold
    draw for the actual resample.

    Scale shape: tokens hash to ``n_buckets`` md5-derived feature
    buckets, so BOTH model tables are bucket-bounded (<= n_buckets rows,
    corpus-size-independent) map-side-partial aggregations; the
    log-ratio table and the 1-row totals join back as broadcasts, and
    the only corpus-keyed shuffle is the final per-document sum. The
    md5 bucket hash (``md5_hash32``) keeps the features
    SQL-reproducible for the DuckDB oracle; swap xxhash64 in production
    when reproducibility isn't needed.

    Output: (id, n_tokens, logw) — add-``alpha`` smoothed, logw rounded
    to 4 dp; documents with zero tokens are dropped (no features)."""
    toks = docs.select(
        F.col(id_col),
        is_target.alias("_tgt"),
        F.explode(_word_list(text_col)).alias("w"),
    ).select(
        id_col, "_tgt", (md5_hash32(F.col("w")) % n_buckets).alias("bkt")
    )
    raw_c = toks.groupBy("bkt").agg(F.count(F.lit(1)).alias("cr"))
    tgt_c = (
        toks.filter("_tgt").groupBy("bkt").agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("tr"),
        F.sum(F.col("_tgt").cast("long")).alias("tt"),
    )
    denom = alpha * n_buckets
    lr = (
        raw_c.join(tgt_c, "bkt", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bkt",
            (
                F.log(
                    (F.coalesce("ct", F.lit(0)) + alpha)
                    / (F.col("tt") + denom)
                )
                - F.log((F.col("cr") + alpha) / (F.col("tr") + denom))
            ).alias("lr"),
        )
    )
    return (
        toks.join(F.broadcast(lr), "bkt")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("lr"), 4).alias("logw"),
        )
    )


def heavy_hitters_topk(
    docs: DataFrame,
    k: int = 20,
    capacity: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Two-pass distributed heavy hitters: (1) per-partition
    Misra-Gries summaries — bounded memory, at most ``capacity``
    counters per task REGARDLESS of vocabulary size (the reason this
    exists: a 100 TB n-gram vocabulary doesn't fit a hash aggregate,
    but its heavy hitters fit ``capacity`` counters) — produce the
    candidate term set; (2) only the candidates are re-counted EXACTLY
    via a broadcast semi-join over the token stream, then top-k with a
    deterministic tie-break. The output is the exact top-k whenever the
    MG guarantee holds: a term is lost only if its count is <=
    n_p/(capacity+1) in EVERY partition (Misra & Gries 1982; mergeable-
    summaries batch form), so any genuinely heavy term survives pass 1
    by pigeonhole. Pass 1 runs in Arrow-batched mapInPandas with
    vectorized per-batch counting; pass 2 is JVM-side.

    Output: (term, n, rank) — the k most frequent tokens."""
    from collections.abc import Iterator

    import pandas as pd

    tokens = docs.select(F.explode(_word_list(text_col)).alias("term"))

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        counters: dict[str, int] = {}
        for pdf in batches:
            for term, c in pdf["term"].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > capacity:
                # batch MG decrement: subtract the (capacity+1)-th
                # largest count from everyone, drop the non-positive —
                # at most `capacity` survivors, same error bound
                vals = np.fromiter(counters.values(), dtype=np.int64)
                t = int(np.partition(vals, len(vals) - capacity - 1)[
                    len(vals) - capacity - 1
                ])
                counters = {
                    w: c - t for w, c in counters.items() if c - t > 0
                }
        yield pd.DataFrame({"term": list(counters.keys())})

    cands = tokens.mapInPandas(mg, "term string").distinct()
    exact = (
        tokens.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        exact.orderBy(F.desc("n"), F.col("term").asc())
        .limit(k)
        .select(
            "term",
            "n",
            F.row_number()
            .over(Window.orderBy(F.desc("n"), F.col("term").asc()))
            .alias("rank"),
        )
    )


def quality_gate(
    docs: DataFrame,
    min_quality: float = 0.5,
    max_dup_trigram: float = 0.2,
    min_words: int = 20,
    max_words: int = 100000,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The FineWeb/Gopher-style quality FILTER CHAIN as one fused
    map-only pass: language-ID, heuristic quality score, duplicate-
    trigram fraction and word count computed in a single projection
    (no joins between the individual signal operators — at 100 TB
    three separate scans + a doc_id join would triple the IO), then
    the keep decision: predicted language in ``langs`` AND quality >=
    ``min_quality`` AND dup-trigram fraction <= ``max_dup_trigram``
    AND ``min_words`` <= words <= ``max_words``. Pure Catalyst
    expressions — zero Python, zero shuffle, whole-stage codegen.

    Output: (id, pred_lang, quality, dup_trigram_frac, n_words, keep)."""
    t = F.col(text_col)
    ws = word_set(text_col)
    scores = {
        lang: F.size(F.array_intersect(ws, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lg in STOPWORDS:
        pred = pred.when(scores[lg] == best, F.lit(lg))
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    upper_ratio = F.when(n_alpha > 0, n_upper / n_alpha).otherwise(0.0)
    quality = F.round(
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + alpha_ratio * 0.3
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
        + (1 - upper_ratio) * 0.1,
        6,
    )
    tri = _ngrams(_word_list(text_col), 3)
    dup_tri = F.round(
        F.when(
            F.size(tri) > 0,
            F.lit(1.0) - F.size(F.array_distinct(tri)) / F.size(tri),
        ).otherwise(F.lit(0.0)),
        6,
    )
    out = docs.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        quality.alias("quality"),
        dup_tri.alias("dup_trigram_frac"),
        n_words.alias("n_words"),
    )
    keep = (
        F.col("pred_lang").isin(list(langs))
        & (F.col("quality") >= min_quality)
        & (F.col("dup_trigram_frac") <= max_dup_trigram)
        & (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
    )
    return out.select("*", keep.alias("keep"))


def corpus_summary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The dataset-card row: one-row corpus summary (doc count, total
    words, mean quality, per-language doc counts) — the numbers every
    training-data release publishes, computed in ONE fused map pass +
    one global aggregation (signals share the projection exactly like
    quality_gate; at 100 TB the whole card costs a single scan). The
    language/quality expressions are the same definitions as
    language_id/quality_score, so the card is consistent with the
    per-document filters downstream.

    Output: (n_docs, total_words, avg_quality, n_en, n_de, n_fr,
    n_und) — avg_quality rounded 6 dp."""
    t = F.col(text_col)
    ws = word_set(text_col)
    scores = {
        lang: F.size(F.array_intersect(ws, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lg in STOPWORDS:
        pred = pred.when(scores[lg] == best, F.lit(lg))
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    upper_ratio = F.when(n_alpha > 0, n_upper / n_alpha).otherwise(0.0)
    quality = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + alpha_ratio * 0.3
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
        + (1 - upper_ratio) * 0.1
    )
    per_doc = docs.select(
        n_words.cast("long").alias("_w"),
        F.round(quality, 6).alias("_q"),
        pred.alias("_lang"),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_w").cast("long").alias("total_words"),
        F.round(F.avg("_q"), 6).alias("avg_quality"),
    ]
    for lg in [*STOPWORDS, "und"]:
        aggs.append(
            F.sum((F.col("_lang") == lg).cast("long"))
            .cast("long")
            .alias(f"n_{lg}")
        )
    return per_doc.agg(*aggs)


def winnow_fingerprints(
    docs: DataFrame,
    width: int = 50,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowed substring fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003): hash every ``width``-char window of normalized text, then
    keep the MINIMUM hash of every ``window`` consecutive positions.
    Selection is CONTENT-defined, so two documents sharing a passage
    select the same fingerprints regardless of where the passage sits
    in each doc — the winnowing guarantee: any shared substring of
    length >= width + window - 1 yields at least one common
    fingerprint, at ~2/(window+1) of the stride-1 fingerprint volume.

    All JVM-side (transform/sequence/slice/array_min higher-order
    functions over the normalized text — no Python, no shuffle); the
    hash is the md5-derived 60-bit value both Spark and DuckDB compute
    identically (the md5_hash32 family), so the oracle replays the
    selection exactly. Production note: swap in xxhash64 for ~3x
    cheaper hashing when SQL reproducibility isn't needed — selection
    logic is unchanged.

    Output: (id, fp) — distinct fingerprints per document."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    base = docs.select(F.col(id_col), norm.alias("t")).filter(
        F.length("t") >= width
    )
    # 60-bit md5 hash of each width-char window (positive in a long;
    # DuckDB: ('0x' || substr(md5(w), 1, 15))::BIGINT)
    ha = F.transform(
        F.sequence(F.lit(1), F.length("t") - (width - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.col("t").substr(i, F.lit(width))), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    n_win = F.size(ha)
    winnowed = F.when(
        n_win >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_win - (window - 1)),
                lambda j: F.array_min(F.slice(ha, j, window)),
            )
        ),
    ).otherwise(F.array(F.array_min(ha)))
    return base.select(
        id_col, F.explode(winnowed.alias("fps")).alias("fp")
    ).distinct()


def substring_dup_pairs(
    docs: DataFrame,
    width: int = 50,
    window: int = 8,
    max_bucket: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring-overlap dedup (the "Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2022 family): two
    documents are related if they share a verbatim ``width``-char
    passage of normalized text. Completes the dedup suite's last
    family — exact-doc, line, n-gram/minhash/simhash near-dup and
    benchmark decontamination exist; this catches verbatim QUOTATION
    (one long shared passage inside otherwise-different docs) that
    whole-doc sketches dilute below threshold and line dedup misses
    when line breaks differ.

    Scale shape: fingerprints come from ``winnow_fingerprints`` (map-
    only, content-defined selection with the winnowing detection
    guarantee for passages >= width + window - 1), so only (id, 60-bit
    fp) rows ever shuffle. A frequency cap drops fingerprints occurring
    in > ``max_bucket`` docs before the self-equi-join (a window shared
    by thousands of docs is boilerplate — line_dedup territory — and
    would otherwise explode the pair count quadratically on one hot
    key). The join is a plain equi-join on the fingerprint; no
    cartesian, no window function.

    Output: (id_a, id_b, n_shared) — doc pairs sharing >= 1 surviving
    fingerprint, with the count of distinct shared fingerprints."""
    fps = winnow_fingerprints(
        docs, width=width, window=window, text_col=text_col, id_col=id_col
    )
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") <= max_bucket)
        .select("fp")
    )
    fps = fps.join(keep, "fp")
    return (
        fps.alias("a")
        .join(fps.alias("b"), "fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def _lcs_of(a: str, b: str) -> tuple[int, str | None]:
    """Exact longest common substring of two strings: (length,
    canonical passage) where the passage is the lexicographically
    smallest common substring of maximal length (deterministic when
    the maximum is not unique). Binary search over achievable lengths
    with literal substring-set membership — exact by string equality,
    never by hash; no suffix automaton."""
    if len(a) > len(b):
        a, b = b, a

    def common_at(L: int) -> str | None:
        if L == 0 or L > len(a):
            return None
        grams = {a[i : i + L] for i in range(len(a) - L + 1)}
        hits = {
            b[j : j + L]
            for j in range(len(b) - L + 1)
            if b[j : j + L] in grams
        }
        return min(hits) if hits else None

    lo, hi = 0, len(a)
    best = None
    while lo < hi:
        mid = (lo + hi + 1) // 2
        p = common_at(mid)
        if p is not None:
            lo, best = mid, p
        else:
            hi = mid - 1
    return lo, best


def substring_dup_exact(
    docs: DataFrame,
    width: int = 50,
    window: int = 8,
    max_bucket: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_passage: bool = False,
) -> DataFrame:
    """Two-pass EXACT verbatim-passage dedup: winnowing candidates,
    then an exact longest-common-substring verify over the candidate
    pairs ONLY (``_lcs_of``: a binary search over achievable lengths
    with literal substring-set membership, exact by string equality,
    never by hash — no suffix automaton). ``keep_passage=True`` also
    returns the canonical passage string per pair (the
    lexicographically smallest maximal common substring) — the input
    ``dup_passage_scrub`` consumes.

    Why the second pass: ``substring_dup_pairs`` inherits winnowing's
    one-sided guarantee — a shared passage >= width + window - 1
    ALWAYS yields a common fingerprint, but (a) a passage in
    [width, width + window - 2] is detected only when the min-hash
    selection happens to land inside it on both sides, and (b) a
    candidate's n_shared says nothing about the passage's true length.
    The verify pass settles every flagged pair exactly: it reports the
    true LCS length over the SAME normalized text the fingerprints
    hashed, and drops sub-``width`` flukes (60-bit collisions —
    astronomically rare, but now impossible by construction).

    Scale shape: pass 1 is unchanged (map-only fingerprints, capped
    equi-join — the plan audit's shape); pass 2 joins the candidate
    PAIRS (already bounded by the max_bucket cap) back to the two
    normalized texts — two equi-joins that ship only candidate rows —
    and runs the LCS in Arrow batches (``mapInPandas``, no Python in
    any corpus-wide path). Per pair the binary search does
    O(log(minlen)) rounds of O(n) slice-set probes; candidate volume,
    not corpus volume, pays it.

    Output: (id_a, id_b, n_shared, lcs_len) for candidate pairs whose
    exact LCS >= width."""
    import pandas as pd

    cands = substring_dup_pairs(
        docs,
        width=width,
        window=window,
        max_bucket=max_bucket,
        text_col=text_col,
        id_col=id_col,
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    txt = docs.select(F.col(id_col), norm.alias("_t"))
    paired = (
        cands.join(
            txt.select(
                F.col(id_col).alias("id_a"), F.col("_t").alias("_ta")
            ),
            "id_a",
        )
        .join(
            txt.select(
                F.col(id_col).alias("id_b"), F.col("_t").alias("_tb")
            ),
            "id_b",
        )
    )

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            lens, passages = [], []
            for a, b in zip(pdf["_ta"], pdf["_tb"]):
                L, p = _lcs_of(a, b)
                lens.append(L)
                passages.append(p)
            out = pd.DataFrame(
                {
                    "id_a": pdf["id_a"],
                    "id_b": pdf["id_b"],
                    "n_shared": pdf["n_shared"],
                    "lcs_len": pd.Series(lens, index=pdf.index),
                    "passage": pd.Series(passages, index=pdf.index),
                }
            )
            yield out[out["lcs_len"] >= width]

    id_t = dict(docs.dtypes)[id_col]
    out = paired.mapInPandas(
        verify,
        schema=(
            f"id_a {id_t}, id_b {id_t}, n_shared long, lcs_len int,"
            " passage string"
        ),
    )
    return out if keep_passage else out.drop("passage")


def dup_passage_scrub(
    docs: DataFrame,
    width: int = 50,
    window: int = 8,
    max_bucket: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicated-passage REMOVAL — the actual Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better")
    treatment: detection alone (``substring_dup_exact``) still trains
    on the verbatim passage once per copy; this operator keeps ONE
    occurrence corpus-wide and strips the rest. Removal rule, fully
    deterministic:

    - verified pairs carry their canonical passage (lexicographically
      smallest maximal common substring of the pair's normalized
      texts);
    - the occurrence survives in the pair's SMALLER id (id_a); every
      doc that appears as id_b removes ALL occurrences of that pair's
      passage from its normalized text. A doc in several pairs removes
      each of its passages, applied in ascending passage order (a
      single deterministic pass; removals are not re-scanned for
      adjacencies they create — the standard one-pass treatment);
    - chains collapse correctly: docs a < b < c sharing one passage
      produce pairs (a,b),(a,c),(b,c), so b and c both scrub and only
      a keeps the passage.

    Output: (id, clean_text, n_removed) over ALL docs — untouched docs
    pass through with their normalized text and n_removed = 0 (the
    normalization is the pipeline's matching form; callers splicing
    removals back into raw text would map offsets instead).

    Scale shape: detection is the two-pass shape above; the removal
    itself is ONE broadcast-friendly join of the per-doc sorted
    passage array (candidate-volume, never corpus-volume) followed by
    a JVM-side ``aggregate(replace(...))`` fold — no Python touches
    the corpus-wide path."""
    pairs = substring_dup_exact(
        docs,
        width=width,
        window=window,
        max_bucket=max_bucket,
        text_col=text_col,
        id_col=id_col,
        keep_passage=True,
    )
    targets = (
        pairs.select(F.col("id_b").alias(id_col), "passage")
        .distinct()
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("passage")).alias("_ps"))
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    base = docs.select(F.col(id_col), norm.alias("_norm"))
    clean = F.when(
        F.col("_ps").isNull(), F.col("_norm")
    ).otherwise(
        F.aggregate(
            F.col("_ps"),
            F.col("_norm"),
            lambda acc, p: F.replace(acc, p, F.lit("")),
        )
    )
    return (
        base.join(targets, id_col, "left")
        .select(
            id_col,
            clean.alias("clean_text"),
            (F.length("_norm") - F.length(clean))
            .cast("int")
            .alias("n_removed"),
        )
    )


def extract_main_text(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """HTML -> training text at corpus scale (the crawl-to-corpus
    boilerplate strip): drop script/style/head blocks and comments,
    strip the remaining tags, decode the common entities, collapse
    whitespace. One chain of Catalyst regexp_replace expressions —
    map-only, whole-stage codegen, zero Python — so a 100 TB HTML
    column converts at scan throughput. (The structural modeler keeps
    its real HTML parser for model inference on SAMPLED pages
    (modeler/schema.py); this is the bulk path where per-row parser
    state would be the bottleneck.) Entity decode runs '&amp;' LAST so
    double-encoded entities don't double-decode."""
    t = F.col(html_col)
    t = F.regexp_replace(t, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?is)<head\b.*?</head>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        t = F.regexp_replace(t, ent, ch)
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return docs.select(F.col(id_col), t.alias("clean_text"))


def html_tag_stats(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Structural HTML statistics for crawl-corpus triage — the cheap
    signals that route a page BEFORE any parse: tag count, link/script/
    image counts, and the text-to-markup ratio (the classic boilerplate
    discriminator: nav/chrome pages are mostly markup, article pages
    mostly text). Pure Catalyst regexp_count/regexp_replace — map-only,
    zero Python, zero shuffles; at 100 TB it rides the scan like
    extract_main_text (which is the NEXT stage for pages this triage
    keeps). Tag patterns are lowercase-literal ('<a[ >]'): the corpus
    builder lowercases markup; add (?i) at the call site for wild HTML.

    Output: (id, n_tags, n_links, n_scripts, n_imgs, n_chars,
    text_chars, text_ratio)."""
    h = F.col(html_col)
    n_chars = F.length(h)
    text_chars = F.length(F.regexp_replace(h, r"<[^>]+>", ""))
    return docs.select(
        F.col(id_col),
        F.regexp_count(h, F.lit(r"<[^>]+>")).cast("int").alias("n_tags"),
        F.regexp_count(h, F.lit("<a[ >]")).cast("int").alias("n_links"),
        F.regexp_count(h, F.lit("<script[ >]")).cast("int").alias(
            "n_scripts"
        ),
        F.regexp_count(h, F.lit("<img[ >]")).cast("int").alias("n_imgs"),
        n_chars.cast("long").alias("n_chars"),
        text_chars.cast("long").alias("text_chars"),
        F.when(n_chars > 0, F.round(text_chars / n_chars, 6))
        .otherwise(F.lit(0.0))
        .alias("text_ratio"),
    )


def vocab_encode(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frequency-vocabulary induction + token encoding — the tokenizer-
    lite stage of a training pipeline: the top ``vocab_size`` words by
    corpus frequency (ties -> lexicographic, fully deterministic) get
    dense ids in rank order, and every document token maps to its id
    (-1 for out-of-vocabulary). Output is the exploded (doc, position,
    word, token_id) table, so downstream packing keeps token order
    without a corpus re-sort.

    Scale shape: ONE word-count shuffle (map-side partial counts), a
    vocab_size-row TakeOrdered + window for the id assignment (tiny),
    and a broadcast LEFT join back onto the exploded corpus — the
    corpus itself never shuffles. This is the standard two-pass
    (count, then encode) vocabulary build; the corpus scans twice but
    the first pass reads only the text column."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda w: w != ""
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(words).alias("pos", "word")
    )
    counts = exploded.groupBy("word").agg(
        F.count(F.lit(1)).alias("_c")
    )
    top = counts.orderBy(F.col("_c").desc(), F.col("word").asc()).limit(
        vocab_size
    )
    vocab = top.withColumn(
        "token_id",
        (
            F.row_number().over(
                Window.orderBy(F.col("_c").desc(), F.col("word").asc())
            )
            - 1
        ).cast("int"),
    ).select("word", "token_id")
    return exploded.join(F.broadcast(vocab), "word", "left").select(
        id_col,
        "pos",
        "word",
        F.coalesce("token_id", F.lit(-1)).cast("int").alias("token_id"),
    )


def bpe_pair_stats(
    docs: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-weighted adjacent-character-pair statistics — the inner
    kernel of BPE tokenizer training (Sennrich et al. 2016, "Neural
    machine translation of rare words with subword units"): each merge
    step of the trainer is argmax over exactly this table.

    Scale shape: word frequencies first (ONE shuffle with map-side
    partial counts over the corpus), then pairs explode only over the
    DISTINCT word table weighted by frequency — at 100 TB the corpus is
    read once while the pair explode touches a vocabulary that is
    orders of magnitude smaller. Returns ``(pair, weight)`` top-k by
    (weight desc, pair asc) — fully deterministic."""
    wf = (
        docs.select(F.explode(_word_list(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        wf.filter(F.length("word") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.concat(
                        F.col("word").substr(i, F.lit(1)),
                        F.lit(" "),
                        F.col("word").substr(i + 1, F.lit(1)),
                    ),
                )
            ).alias("pair"),
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def _merge_symbols(syms: Column, left: str, right: str, merged: str) -> Column:
    """One left-to-right non-overlapping merge pass over a symbol
    array, as a single Catalyst fold (no Python): carry the last
    unmerged symbol as ``pending``; when (pending, x) == (left, right)
    replace both with ``merged`` (which can itself merge with a LATER
    occurrence but never re-merges in place — standard BPE pass
    semantics)."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pending"),
    )
    step = lambda acc, x: F.when(  # noqa: E731
        (acc["pending"] == left) & (x == F.lit(right)),
        F.struct(acc["out"].alias("out"), F.lit(merged).alias("pending")),
    ).otherwise(
        F.struct(
            F.when(
                acc["pending"].isNotNull(),
                F.concat(acc["out"], F.array(acc["pending"])),
            )
            .otherwise(acc["out"])
            .alias("out"),
            x.alias("pending"),
        )
    )
    fin = lambda acc: F.when(  # noqa: E731
        acc["pending"].isNotNull(),
        F.concat(acc["out"], F.array(acc["pending"])),
    ).otherwise(acc["out"])
    return F.aggregate(syms, acc0, step, fin)


def bpe_train(
    docs: DataFrame,
    num_merges: int = 30,
    text_col: str = "text",
    end_token: str = "</w>",
    min_weight: int = 2,
    batch_merges: int = 1,
    stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Distributed BPE tokenizer training: learn ``num_merges`` merge
    rules from corpus word frequencies.

    The merge loop is inherently sequential (each argmax depends on the
    previous merge), so the baseline shape collects exactly ONE row
    (the best pair) per round — at a production 32k-merge vocabulary
    that is tens of thousands of tiny driver rounds. ``batch_merges``
    = m > 1 applies up to m merges per round while provably emitting
    the IDENTICAL merge list (differentially swept in
    tests/test_bpe.py):

    - fetch the top m+1 candidate pairs ordered (weight desc, l, r);
    - select a PREFIX of that ranking, stopping at the first candidate
      that (a) shares a symbol with an already-selected pair, (b)
      concatenates to an already-existing symbol string, or (c)
      concatenates identically to an earlier selection — the three
      ways a later merge's pair counts could depend on an earlier one;
    - truncate the selection to weights STRICTLY above the stop
      point's weight (the m+1-th candidate when nothing conflicted).
      Every pair created or changed by the selected merges involves a
      conflicting symbol, so its new count is bounded by some old
      conflicting pair's count <= the stop weight < every kept
      selection's weight: the sequential argmax sequence is exactly
      the kept prefix, ties included (tiebreak order never reached).
    - if nothing survives (immediate conflict), apply just the top-1 —
      the plain sequential step, always exact.

    Non-interacting corpora take ~m merges/round (one pair-count job +
    one fold/checkpoint instead of per-merge pairs); adversarial ones
    degrade gracefully to the sequential rate. All heavy work stays
    distributed AND vocabulary-sized: after the initial word count
    (the only corpus-wide shuffle) every round re-counts pairs over
    the distinct-word symbol table, weighted by frequency, and
    rewrites it with chained Catalyst folds (``_merge_symbols``) + one
    eager checkpoint. Words end with ``end_token`` so prefix/suffix
    merges stay distinct, as in the original algorithm.

    ``stats``, when given, receives {"rounds": <driver rounds run>} —
    the batching win is rounds ~= num_merges / m.

    Returns the ordered merge list [(left, right, weight), ...];
    stops early when the best pair's weight < ``min_weight``."""
    if batch_merges < 1:
        raise ValueError("batch_merges must be >= 1")
    wf = (
        docs.select(F.explode(_word_list(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = wf.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(end_token))
        ).alias("syms"),
    ).localCheckpoint()

    # exact driver-side symbol ledger for the concat-collision guard
    # (b): the initial alphabet (one tiny distinct over the symbol
    # table — alphabet-sized result) plus every token a merge creates.
    # Only needed when batching; the sequential path keeps its original
    # two-jobs-per-merge shape untouched.
    known_symbols: set[str] = set()
    if batch_merges > 1:
        known_symbols = {
            r["s"]
            for r in vocab.select(
                F.explode("syms").alias("s")
            ).distinct().collect()
        }

    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        rounds += 1
        k = min(batch_merges, num_merges - len(merges))
        cands = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i + 1).alias("l"),
                            F.element_at(F.col("syms"), i + 2).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("w"))
            .orderBy(F.col("w").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(k + 1)
            .collect()
        )
        if not cands or cands[0]["w"] < min_weight:
            break
        if k == 1:
            row = cands[0]
            left, right = row["p"]["l"], row["p"]["r"]
            selected = [(left, right, int(row["w"]))]
        else:
            used: set[str] = set()
            concats: set[str] = set()
            selected = []
            # stop weight: the first conflicting candidate, else the
            # (k+1)-th fetched row (pairs beyond the fetch window can
            # conflict too), else -inf when the window saw every pair
            w_stop = float("-inf")
            for row in cands[:k]:
                l, r, w = row["p"]["l"], row["p"]["r"], int(row["w"])
                if w < min_weight:
                    w_stop = max(w_stop, float(w))
                    break
                if (
                    l in used
                    or r in used
                    or (l + r) in known_symbols
                    or (l + r) in concats
                ):
                    w_stop = max(w_stop, float(w))
                    break
                selected.append((l, r, w))
                used.update((l, r))
                concats.add(l + r)
            else:
                if len(cands) > k:
                    w_stop = max(w_stop, float(cands[k]["w"]))
            selected = [m for m in selected if m[2] > w_stop]
            if not selected:
                # immediate conflict: one exact sequential step
                row = cands[0]
                selected = [
                    (row["p"]["l"], row["p"]["r"], int(row["w"]))
                ]
        col = F.col("syms")
        for left, right, _w in selected:
            col = _merge_symbols(col, left, right, left + right)
            known_symbols.add(left + right)
        vocab = vocab.withColumn("syms", col).localCheckpoint()
        merges.extend(selected)
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_token: str = "</w>",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply learned BPE merges to a corpus: per document, tokenize to
    words, split to characters + ``end_token``, then replay the merge
    list in order. Each merge is one map-only Catalyst fold over the
    token arrays (zero shuffles, zero Python); the expression chain is
    checkpointed every ``checkpoint_every`` merges so codegen depth
    stays bounded. Returns ``(id_col, pos, token)`` exploded in
    subword order."""
    words = docs.select(
        F.col(id_col),
        F.posexplode(_word_list(F.col(text_col))).alias("widx", "word"),
    )
    enc = words.select(
        id_col,
        "widx",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(end_token))
        ).alias("syms"),
    )
    for j, m in enumerate(merges):
        left, right = m[0], m[1]
        enc = enc.withColumn(
            "syms", _merge_symbols(F.col("syms"), left, right, left + right)
        )
        if (j + 1) % checkpoint_every == 0:
            enc = enc.localCheckpoint()
    flat = enc.select(
        id_col, "widx", F.posexplode("syms").alias("sidx", "token")
    )
    w = Window.partitionBy(id_col).orderBy("widx", "sidx")
    return flat.select(
        id_col, (F.row_number().over(w) - 1).alias("pos"), "token"
    )


def hashed_ngram_classifier(
    docs: DataFrame,
    n_buckets: int = 4096,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """fastText-style linear text classifier INFERENCE (Joulin et al.
    2016, "Bag of Tricks for Efficient Text Classification") — the
    shape every production quality/toxicity filter takes: word unigram
    + bigram features hashed into ``n_buckets`` buckets, mean-pooled,
    one linear layer, sigmoid. Here the weight vector is a
    deterministic md5-derived stand-in (w[b] uniform in [-1, 1]) so the
    DuckDB oracle can replay inference bit-for-bit; in production you'd
    broadcast the trained vector the same way — the PLUMBING, not the
    weights, is what has to scale.

    Scale shape: tokenization and bigram construction are JVM array
    expressions (no Python); the weight table is generated column-side
    (``sequence`` over bucket ids — n_buckets rows, corpus-independent)
    and joins back as a broadcast; scoring is explode → broadcast join
    → per-doc partial agg. The only corpus-keyed shuffle is the final
    groupBy(id). Mean pooling makes the score length-invariant, exactly
    as fastText averages input vectors before the linear layer.

    Output: (id, n_feats, score, label) — score = sigmoid rounded 4 dp,
    label = score >= 0.5; docs with zero tokens are dropped.

    Implementation note: the word array materializes in its own
    projection first (a lambda that indexes the raw `split` expression
    re-evaluates the tokenizer per element — measured 3x slower), and
    bigrams come from `zip_with` over two array slices rather than
    per-index `element_at` (streams both arrays once; a further 5x on
    the sf0.1 corpus)."""
    words = docs.select(F.col(id_col), _word_list(text_col).alias("_w"))
    w = F.col("_w")
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    feats = words.select(
        F.col(id_col),
        F.explode(
            F.concat(w, F.when(F.size(w) >= 2, bigrams).otherwise(F.array()))
        ).alias("f"),
    ).select(id_col, (md5_hash32(F.col("f")) % n_buckets).alias("bkt"))
    spark = docs.sparkSession
    weights = spark.range(n_buckets).select(
        F.col("id").alias("bkt"),
        ((md5_hash32(F.col("id")) % 2001 - 1000) / 1000.0).alias("w"),
    )
    return (
        feats.join(F.broadcast(weights), "bkt")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.round(
                1.0 / (1.0 + F.exp(-(F.lit(bias) + F.avg("w")))), 4
            ).alias("score"),
        )
        .select(
            id_col,
            "n_feats",
            "score",
            (F.col("score") >= 0.5).alias("label"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    size: int = 500,
    overlap: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document overlapping character chunking (the RAG /
    context-window prep op: split every document into ``size``-char
    chunks whose starts advance by ``size - overlap``). Chunk starts
    run while ``start <= len - overlap`` (at least one), which covers
    every character and — because the stride exceeds the tail guard —
    can never emit a chunk fully contained in its predecessor.

    Scale shape: one map-only projection — ``sequence`` over chunk
    starts, ``posexplode``, ``substr`` — zero shuffles, zero Python;
    output partitioning inherits the input's, so a downstream
    embed/encode stage streams chunk batches without a repartition.

    Output: (id, chunk_id, char_start, n_chars, chunk); empty texts
    produce no chunks."""
    step = size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than size")
    t = F.col(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(t) - overlap, F.lit(1)),
        F.lit(step),
    )
    return (
        docs.filter(F.length(t) > 0)
        .select(
            F.col(id_col),
            t.alias("_t"),
            F.posexplode(starts).alias("chunk_id", "_s"),
        )
        .select(
            id_col,
            "chunk_id",
            (F.col("_s") - 1).cast("long").alias("char_start"),
            F.length(F.col("_t").substr(F.col("_s"), F.lit(size)))
            .cast("long")
            .alias("n_chars"),
            F.col("_t").substr(F.col("_s"), F.lit(size)).alias("chunk"),
        )
    )


def cms_frequency_estimates(
    docs: DataFrame,
    query_terms: list[str],
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Count-min sketch term-frequency estimation (Cormode &
    Muthukrishnan 2005) — the mergeable bounded-memory frequency
    structure for vocabularies that don't fit a hash aggregate: the
    sketch is a depth x width counter matrix (here 4 x 1024 = 4096
    cells, corpus-size-INDEPENDENT), each token increments one cell
    per row under an independent hash, and a point query reads the MIN
    over its depth cells (never an underestimate; overestimate bounded
    by eps*N with eps = e/width at the usual confidence).

    Scale shape: the sketch builds as ONE partial-aggregated groupBy
    over (row, cell) — map-side combine collapses the token stream
    into <= depth*width cells per task before the shuffle, the
    distributed equivalent of merging per-partition sketches (CMS
    merge = cell-wise add, which is exactly what the combine does).
    Point queries join the depth-row lookup set against the bounded
    sketch table. Hashes are md5-derived, so the ENTIRE sketch is
    deterministic and the oracle replays every cell exactly — the
    estimate column is gate-checked value-for-value, not by tolerance.

    Output per query term: (term, true_n, cms_est, never_under) with
    true_n from an exact count for the differential."""
    tokens = docs.select(F.explode(_word_list(text_col)).alias("tok"))
    rows = F.array(*[F.lit(r) for r in range(depth)])
    cells = tokens.select(
        F.explode(
            F.transform(
                rows,
                lambda r: F.struct(
                    r.alias("r"),
                    (
                        md5_hash32(
                            F.concat(
                                r.cast("string"), F.lit(":"), F.col("tok")
                            )
                        )
                        % width
                    ).alias("cell"),
                ),
            )
        ).alias("rc")
    )
    sketch = cells.groupBy("rc.r", "rc.cell").agg(
        F.count(F.lit(1)).alias("n")
    )
    spark = docs.sparkSession
    q = spark.createDataFrame(
        [(t,) for t in query_terms], "term string"
    ).select(
        "term",
        F.explode(
            F.transform(
                rows,
                lambda r: F.struct(
                    r.alias("r"),
                    (
                        md5_hash32(
                            F.concat(
                                r.cast("string"), F.lit(":"), F.col("term")
                            )
                        )
                        % width
                    ).alias("cell"),
                ),
            )
        ).alias("rc"),
    ).select("term", "rc.r", "rc.cell")
    est = (
        q.join(sketch, ["r", "cell"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("cms_est"))
    )
    true_n = (
        tokens.filter(F.col("tok").isin(query_terms))
        .groupBy(F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return (
        est.join(true_n, "term", "left")
        .select(
            "term",
            F.coalesce("true_n", F.lit(0)).cast("long").alias("true_n"),
            "cms_est",
            (F.col("cms_est") >= F.coalesce("true_n", F.lit(0))).alias(
                "never_under"
            ),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining by pointwise mutual information over word
    bigrams (Church & Hanks 1990): PMI(x,y) = ln(P(xy) / (P(x)P(y)))
    with P(xy) = c_xy/B over bigram occurrences and P(x) = c_x/N over
    token occurrences — the standard phrase-detection signal (word2vec
    phrases, spaCy collocations) a corpus-curation pipeline runs before
    vocabulary induction.

    Scale shape: tokenization and bigram construction are the same JVM
    array expressions as hashed_ngram_classifier (materialized word
    array, zip_with over two slices — never per-index element_at); the
    bigram explode is map-only; c_xy comes from one partial-agg groupBy
    on (w1, w2); the unigram-count table is vocabulary-sized, so both
    c_x and c_y join back as broadcasts; N and B are 1-row broadcast
    crossJoins. The only corpus-keyed shuffles are the two counting
    groupBys. min_count prunes the pair table BEFORE the joins.

    PMI arithmetic is arranged as (c_xy*N*N)/(B*c_x*c_y) in doubles so
    a SQL oracle replays it bit-for-bit.

    Output: (w1, w2, pair_count, pmi) for bigrams with
    pair_count >= min_count."""
    words = docs.select(_word_list(text_col).alias("_w"))
    w = F.col("_w")
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        words.filter(F.size(w) >= 2)
        .select(F.explode(bigrams).alias("_bg"))
        .select(F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    )
    uni = (
        words.select(F.explode(w).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tok = uni.agg(F.sum("c").cast("double").alias("n"))
    pcnt = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    b_tot = pcnt.agg(F.sum("pair_count").cast("double").alias("b"))
    cx = uni.select(F.col("tok").alias("w1"), F.col("c").alias("_cx"))
    cy = uni.select(F.col("tok").alias("w2"), F.col("c").alias("_cy"))
    return (
        pcnt.filter(F.col("pair_count") >= min_count)
        .join(F.broadcast(cx), "w1")
        .join(F.broadcast(cy), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(b_tot))
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.round(
                F.log(
                    (
                        F.col("pair_count").cast("double")
                        * F.col("n")
                        * F.col("n")
                    )
                    / (
                        F.col("b")
                        * F.col("_cx").cast("double")
                        * F.col("_cy").cast("double")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    k_const: int = 60,
    topn: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    ranked retrieval lists: score(d) = sum over systems of
    1/(k + rank_s(d)), the standard way hybrid search composes a
    lexical retriever (BM25) with a vector retriever without score
    calibration. Inputs are (id, rank) lists as produced by bm25_topk
    and simsearch.cosine_topk; an id missing from one list contributes
    0 from that system (reported as rank 0).

    Scale shape: fusion runs over the RETRIEVED lists (k-bounded, tiny)
    — one full-outer equi-join of two <=k-row frames plus a topn-row
    window; corpus-sized work happens inside the retrievers, which keep
    their own scale shapes. At fleet scale the per-query lists arrive
    already bounded, so fusion cost is O(k) per query regardless of
    corpus size.

    Output: (id, rank_a, rank_b, rrf_score, fused_rank), topn rows by
    descending score, ties broken on ascending id."""
    a = ranked_a.select(
        F.col(id_col).alias("id"), F.col("rank").alias("rank_a")
    )
    b = ranked_b.select(
        F.col(id_col).alias("id"), F.col("rank").alias("rank_b")
    )
    score = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank_a")),
            F.lit(0.0),
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank_b")),
            F.lit(0.0),
        ),
        6,
    )
    fused = a.join(b, "id", "full_outer").select(
        "id",
        F.coalesce("rank_a", F.lit(0)).alias("rank_a"),
        F.coalesce("rank_b", F.lit(0)).alias("rank_b"),
        score.alias("rrf_score"),
    )
    top = fused.orderBy(F.desc("rrf_score"), F.col("id").asc()).limit(topn)
    return top.select(
        "id",
        "rank_a",
        "rank_b",
        "rrf_score",
        F.row_number()
        .over(Window.orderBy(F.desc("rrf_score"), F.col("id").asc()))
        .alias("fused_rank"),
    )


def zipf_fit(
    docs: DataFrame,
    top_n: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Zipf-law corpus fingerprint: least-squares fit of
    ln(freq) ~ ln(rank) over the ``top_n`` most frequent words, plus
    the exact vocabulary / token counts (the Heaps-law point). Natural
    corpora fit slope ~ -1 with high R^2; synthetic, templated, or
    heavily-duplicated corpora deviate — a one-row drift detector to
    run per ingest batch next to corpus_summary.

    Scale shape: one corpus-keyed word-count groupBy (map-side partial
    agg); the top-n selection plans as TakeOrderedAndProject (no global
    sort materialized); the rank window and the regression sums run
    over the bounded top-n frame. Ties in frequency rank by ascending
    word so the fit is deterministic.

    Output one row: (n_tokens, vocab, n_top, slope, intercept, r2),
    floats rounded to 6 dp."""
    wf = (
        docs.select(F.explode(_word_list(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    totals = wf.agg(
        F.sum("freq").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    top = (
        wf.orderBy(F.desc("freq"), F.col("w").asc())
        .limit(top_n)
        .select(
            "freq",
            F.row_number()
            .over(Window.orderBy(F.desc("freq"), F.col("w").asc()))
            .alias("rank"),
        )
    )
    pts = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov, varx, vary = (
        k * sxy - sx * sy,
        k * sxx - sx * sx,
        k * syy - sy * sy,
    )
    fitted = s.select(
        F.col("k").cast("long").alias("n_top"),
        F.round(cov / varx, 6).alias("slope"),
        F.round((sy - (cov / varx) * sx) / k, 6).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )
    return totals.crossJoin(fitted)


def unicode_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode-canonical duplicate grouping: texts that differ only in
    normalization form or case — NFC 'é' vs the decomposed 'e'+U+0301,
    upper vs lower — collapse into one group. This is the
    canonicalization layer ABOVE ``exact_dedup``'s byte identity: web
    corpora mix encoders, and the same sentence arrives in both
    composition forms (UAX #15). Key = md5(lower(NFC(text))), computed
    in an Arrow-vectorized pandas UDF (pandas .str.normalize — Spark
    has no NFC builtin); only (id, 16-byte key) rows reach the shuffle,
    same scale shape as the audio/phash dedups.

    Output: (id, group_id = min id of the group, n_docs) — one row per
    doc in a group of 2+."""
    from pyspark.sql import functions as F  # noqa: F811

    # lambda form: the module's PEP-563 string annotations break
    # pandas_udf signature inspection on a def
    _nfc_lower = F.pandas_udf(
        lambda s: s.str.normalize("NFC").str.lower(), "string"
    )

    keyed = docs.select(
        F.col(id_col).alias("_id"),
        F.md5(_nfc_lower(F.col(text_col))).alias("_k"),
    )
    groups = (
        keyed.groupBy("_k")
        .agg(
            F.min("_id").alias("group_id"),
            F.count(F.lit(1)).cast("int").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return keyed.join(groups, "_k").select(
        F.col("_id").alias(id_col), "group_id", "n_docs"
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase search via POSITIONAL postings — the IR primitive
    BM25's bag-of-words scoring cannot express: build (doc, position,
    word) postings with one posexplode, then intersect the phrase
    words' posting lists on (doc, position - k) equi-keys, one
    co-partitioned join per additional phrase word. This is how a
    phrase query runs against a positional inverted index at corpus
    scale: each join's inputs are ONLY the two words' postings (the
    word filters prune the exploded table before any shuffle), never
    the full corpus.

    Output: (id, n_matches) for docs containing the phrase at least
    once — n_matches counts distinct start positions."""
    words = phrase.lower().split()
    if not words:
        raise ValueError("empty phrase")
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    postings = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(toks).alias("pos", "w"),
    )
    matches = postings.filter(F.col("w") == words[0]).select("_id", "pos")
    for k, wk in enumerate(words[1:], 1):
        nxt = postings.filter(F.col("w") == wk).select(
            "_id", (F.col("pos") - k).alias("pos")
        )
        matches = matches.join(nxt, ["_id", "pos"])
    return (
        matches.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .select(F.col("_id").alias(id_col), "n_matches")
    )
