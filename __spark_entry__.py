"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2 or
a training-data pipeline op, expressed Spark-first via
``smart_crawler_spark``; ``oracle_sql()`` holds the DuckDB-equivalent
ANSI SQL run on the same parquet views. Every query has an oracle:
approximate operators (MinHash/SimHash/LSH/IVF/HLL) are checked against
the exact answer — their configs are sized for recall 1.0 at gate scale
(and SimHash's token hash is md5-derived so DuckDB recomputes the
signatures themselves).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from smart_crawler_spark.frontier.canonical import (  # noqa: E402
    canonical_relative_url,
    url_host,
)
from smart_crawler_spark.operators import minhash, simsearch, textops  # noqa: E402
from smart_crawler_spark.operators.components import dedup_groups  # noqa: E402

# --------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _doubled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ copy with shifted ids — guarantees exact-dup groups."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "text").unionAll(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )


_REGEX_PATTERNS = [
    ("p_data", "^data|^batch"),
    ("p_num", "[0-9]"),
    ("p_spark", "spark.*window|window.*spark"),
]


# --------------------------------------------------------------------------
# query implementations


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def frontier_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 as a relational op: anti-join new candidates against seen keys."""
    orders = _t(spark, sf_dir, "orders")
    seen = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    from smart_crawler_spark.frontier.dedup import dedup_new_urls

    return dedup_new_urls(
        orders.select("o_orderkey", "o_custkey"), seen, hash_col="o_custkey"
    ).orderBy("o_orderkey")


def per_host_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 as a relational op: best-first top-K per partition key."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_orderdate", "rk")
        .orderBy("o_custkey", "rk")
    )


def idn_hosts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN punycode normalization (frontier/canonical.py
    idn_normalize_host): internationalized hostnames collapse to their
    RFC 3490 ToASCII wire form so seen keys and politeness budgets
    agree. ASCII hosts take the codegen lower() fast path; only
    non-ASCII rows hit the Arrow UDF. The plant cycles five hosts by
    event_id % 5 (two ASCII incl. a mixed-case one, three IDN); the
    oracle maps each planted host to its punycode closed-form."""
    from smart_crawler_spark.frontier.canonical import idn_normalize_host

    ev = _t(spark, sf_dir, "events")
    hosts = F.array(
        F.lit("crawl.example"),
        F.lit("MÜNCHEN.example"),
        F.lit("café.test"),
        F.lit("Plain.Test"),
        F.lit("bücher.example"),
    )
    df = ev.select(
        "event_id",
        F.element_at(hosts, (F.col("event_id") % 5 + 1).cast("int")).alias(
            "host"
        ),
    )
    return idn_normalize_host(df).orderBy("event_id")


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9/F1: canonical relative URL + host of synthesized URLs."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    url = F.concat(
        F.lit("http://h"),
        (F.col("user_id") % 5).cast("string"),
        F.lit(".test"),
        F.when(F.col("event_id") % 11 == 0, F.lit("/")).otherwise(
            F.concat(F.lit("/p/"), F.col("event_id").cast("string"))
        ),
        F.when(
            F.col("event_id") % 7 == 0,
            F.concat(F.lit("?k="), (F.col("event_id") % 3).cast("string")),
        ).otherwise(F.lit("")),
        F.when(F.col("event_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    df = ev.select("event_id", url.alias("url"))
    return df.select(
        "event_id",
        "url",
        url_host(F.col("url")).alias("host"),
        canonical_relative_url(F.col("url")).alias("rel_url"),
    ).orderBy("event_id")


def _trap_url_population(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic URL mix with planted trap families: path cycles
    (%13), calendar walks spanning 1980-2049 (%11), depth-9 paths (%7),
    session-id (%17) and faceted-param (%19) queries, organic rest."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 4000)
    eid = F.col("event_id")
    host = F.concat(
        F.lit("http://h"), (F.col("user_id") % 5).cast("string"), F.lit(".test")
    )
    path = (
        F.when(eid % 13 == 0, F.lit("/a/b/a/b/a/b"))
        .when(
            eid % 11 == 0,
            F.concat(
                F.lit("/cal/"),
                (eid % 70 + 1980).cast("string"),
                F.lit("/"),
                (eid % 12 + 1).cast("string"),
            ),
        )
        .when(
            eid % 7 == 0,
            F.concat(F.lit("/d/e/f/g/h/i/j/k/"), eid.cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("/p/"),
                (eid % 50).cast("string"),
                F.lit("/item/"),
                eid.cast("string"),
            )
        )
    )
    query = (
        F.when(eid % 17 == 0, F.concat(F.lit("?phpsessid=s"), eid.cast("string")))
        .when(eid % 19 == 0, F.lit("?a=1&b=2&c=3&d=4&e=5&f=6"))
        .when(eid % 3 == 0, F.concat(F.lit("?page="), (eid % 4).cast("string")))
        .otherwise(F.lit(""))
    )
    return ev.select("event_id", F.concat(host, path, query).alias("url"))


def url_trap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap verdicts (frontier/traps.py trap_features): map-only
    Catalyst features — path depth, repeated-segment fraction, query
    param count, session-id key, implausible calendar year — and the
    composite is_trap flag, over the planted trap-family population.
    The oracle replays every rule and threshold in SQL."""
    from smart_crawler_spark.frontier import traps

    urls = _trap_url_population(spark, sf_dir)
    return traps.trap_features(urls, keep_cols=["event_id", "url"]).orderBy(
        "event_id"
    )


def url_templates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL template mining (frontier/traps.py url_templates): digit runs
    in the path collapse to {d}, one hash agg per template with
    n_urls / n_hosts / lexicographically-first sample — the family-level
    view a frontier uses to budget generated link spaces."""
    from smart_crawler_spark.frontier import traps

    urls = _trap_url_population(spark, sf_dir)
    return traps.url_templates(urls).orderBy("template")


def template_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-template crawl budget (frontier/traps.py template_cap): at
    most 3 URLs survive per template family, picked deterministically
    (URL ascending). Plans as WindowGroupLimit — map tasks ship ~k rows
    per family into the shuffle (pinned in test_traps.py)."""
    from smart_crawler_spark.frontier import traps

    urls = _trap_url_population(spark, sf_dir)
    return (
        traps.template_cap(urls, k=3, order_cols=["url", "event_id"])
        .select("event_id", "url", "template")
        .orderBy("template", "url")
    )


def quantize_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (operators/simsearch.py
    quantize_embeddings): per-vector symmetric scale, JVM array
    functions only; the oracle replays the identical IEEE arithmetic
    (scale, codes, max reconstruction error) element-for-element."""
    from smart_crawler_spark.operators.simsearch import quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    out = quantize_embeddings(emb)
    return out.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.concat_ws(
            ",", F.transform("q", lambda x: x.cast("string"))
        ).alias("q_csv"),
        F.round("max_abs_err", 9).alias("max_abs_err"),
    ).orderBy("vec_id")


def scd2_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval build (operators/relational.py scd2_history):
    5 synthetic snapshot versions per key with deterministic status
    transitions and a null-to-value score flip collapse into validity
    intervals (valid_to null = current). Gaps-and-islands with
    key-partitioned windows only; the oracle replays the same windows
    in SQL."""
    from smart_crawler_spark.operators.relational import scd2_history

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select("event_id")
    )
    snaps = (
        ev.withColumn("ver", F.explode(F.sequence(F.lit(0), F.lit(4))))
        .withColumn(
            "status",
            F.when(
                F.col("ver") < F.col("event_id") % 3 + 1, F.lit("new")
            )
            .when(F.col("ver") < 4, F.lit("seen"))
            .otherwise(F.lit("expired")),
        )
        .withColumn(
            "score",
            F.when(F.col("ver") == 0, F.lit(None).cast("long")).otherwise(
                (F.col("event_id") + F.floor(F.col("ver") / 2)) % 3
            ),
        )
    )
    return scd2_history(
        snaps, ["event_id"], "ver", ["status", "score"]
    ).orderBy("event_id", "valid_from")


def quantized_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k over DEQUANTIZED int8 vectors — proves the
    quantized storage path stays query-compatible end-to-end: quantize
    (JVM arrays) -> dequantize -> brute-force cosine rank. The oracle
    replays quantization, dequantization and the ranking in SQL."""
    from smart_crawler_spark.operators.simsearch import quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    qz = quantize_embeddings(emb)
    deq = qz.select(
        "vec_id",
        F.transform(
            "q", lambda c: c.cast("double") * F.col("scale")
        ).alias("embedding"),
    )
    queries = deq.filter(F.col("vec_id") < 5)
    return simsearch.cosine_topk(queries, deq, k=5).orderBy(
        "query_id", "rank"
    )


def weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic sampling
    (operators/relational.py weighted_sample): inclusion probability
    0.5 * price / max(price), md5-keyed draw, one broadcast max —
    hash-exact oracle replays the identical arithmetic."""
    from smart_crawler_spark.operators.relational import weighted_sample

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return weighted_sample(
        o, "o_totalprice", "o_orderkey", target_fraction=0.5
    ).orderBy("o_orderkey")


def snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot delta (operators/relational.py snapshot_diff): one
    full-outer join classifying every key as added / removed / changed
    / unchanged between two index snapshots. The new snapshot derives
    from the old with planted drift: every 17th key removed, every
    13th key's event_type rewritten, every 23rd re-added under a
    shifted id; null-safe comparisons throughout."""
    from smart_crawler_spark.operators.relational import snapshot_diff

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .select("event_id", "event_type", "user_id")
    )
    new = ev.filter(F.col("event_id") % 17 != 0).withColumn(
        "event_type",
        F.when(F.col("event_id") % 13 == 0, F.lit("upd")).otherwise(
            F.col("event_type")
        ),
    )
    added = ev.filter(F.col("event_id") % 23 == 0).select(
        (F.col("event_id") + 100000).alias("event_id"),
        "event_type",
        "user_id",
    )
    return snapshot_diff(
        ev,
        new.unionByName(added),
        ["event_id"],
        ["event_type", "user_id"],
    ).orderBy("event_id")


def host_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host hygiene rollup (frontier/traps.py host_profile): URL
    count, trap count/rate, distinct template families — one hash agg
    on host over the planted trap population."""
    from smart_crawler_spark.frontier import traps

    urls = _trap_url_population(spark, sf_dir)
    return traps.host_profile(urls).orderBy("host")


def mirror_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-site detection (frontier/traps.py mirror_families):
    identical payloads on >= 2 hosts, one md5-keyed hash agg. Every 4th
    document is planted on a second host; the oracle recomputes the
    family table from the same plant rule."""
    from smart_crawler_spark.frontier import traps

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        F.concat(
            F.lit("http://m"),
            (F.col("doc_id") % 6).cast("string"),
            F.lit(".test/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    mirror = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(
            F.lit("http://m"),
            ((F.col("doc_id") + 3) % 6).cast("string"),
            F.lit(".test/mirror/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    pages = base.unionAll(mirror)
    return traps.mirror_families(pages).orderBy("content_key")


def regex_join_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: golden-pattern regex join → count matrix per (pattern, lang).

    The pattern set is small and known, so the crossJoin+rlike(col) form
    (which recompiles the regex per row) is rewritten as a union of
    literal-pattern scans — each rlike compiles once per task and stays
    in whole-stage codegen; Catalyst shares the one documents scan.
    ~20× faster at sf0.1, identical semantics (the generic column-pattern
    form lives in modeler/evaluate.py:count_matrix for dynamic goldens).
    """
    docs = _t(spark, sf_dir, "documents").select("text", "lang")
    per_pat = [
        docs.filter(F.col("text").rlike(pat)).select(
            F.lit(name).alias("pat_name"), "lang"
        )
        for name, pat in _REGEX_PATTERNS
    ]
    unioned = per_pat[0]
    for df in per_pat[1:]:
        unioned = unioned.unionByName(df)
    return (
        unioned.groupBy("pat_name", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("pat_name", "lang")
    )


def schema_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: exact signature grouping (hash of the schema key)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "signature", F.md5(F.concat_ws("|", "lang", "source"))
        )
        .groupBy("signature")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.count(F.lit(1)).alias("n_pages"),
        )
        .orderBy("signature")
    )


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        textops.exact_dedup(_doubled_docs(spark, sf_dir))
        .orderBy("text_hash")
    )


def phrase_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search (operators/textops.py phrase_search):
    positional postings via one posexplode, phrase words' lists
    intersected on (doc, position - k) — the phrase-query plan a
    positional inverted index runs. Phrase 'table table' (adjacent
    repeats occur naturally in the corpus); the oracle re-derives
    match positions with array indexing over the same tokenization."""
    from smart_crawler_spark.operators.textops import phrase_search

    docs = _t(spark, sf_dir, "documents")
    return phrase_search(docs, "table table").orderBy("doc_id")


def unicode_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-canonical dedup (operators/textops.py unicode_dedup):
    texts differing only in normalization form or case collapse. The
    corpus plants triplets over the documents table — base doc b
    (b%3==0) lends its text to b+1 and b+2 with prefixes 'Caf\\u00e9 '
    (composed), 'Cafe\\u0301 ' (decomposed) and 'CAF\\u00c9 '
    (uppercase composed) — so every complete triplet merges under
    lower(NFC(.)) while no byte-level pair matches. The oracle replays
    the plant and the normalization with DuckDB's nfc_normalize."""
    from smart_crawler_spark.operators.textops import unicode_dedup

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 498)
    base = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("_bid"), F.col("text").alias("_btext")
    )
    prefix = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("Café "))
        .when(F.col("doc_id") % 3 == 1, F.lit("Café "))
        .otherwise(F.lit("CAFÉ "))
    )
    corpus = docs.join(
        F.broadcast(base),
        docs.doc_id - docs.doc_id % 3 == base._bid,
    ).select(
        "doc_id", F.concat(prefix, F.col("_btext")).alias("text")
    )
    return unicode_dedup(corpus).orderBy("doc_id")


def jaccard_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return textops.jaccard_near_dup_pairs(docs, threshold=0.5).orderBy(
        "id_a", "id_b"
    )


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_stats(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition signals (operators/textops.py): duplicate
    uni/bi/tri-gram fractions per document. Map-only higher-order
    Catalyst expressions — no shuffle, no Python."""
    return textops.repetition_stats(
        _t(spark, sf_dir, "documents")
    ).orderBy("doc_id")


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (operators/textops.py
    sequence_pack): concat-and-chunk the deterministic document stream
    into 512-token training sequences. The global token prefix sum is
    two-phase — per-md5-bucket window cumsum, then a 64-row broadcast
    bucket-offset table — so no window partition ever holds the whole
    corpus; per doc it reports the sequence id, the offset inside it,
    and whether the doc straddles a sequence boundary."""
    return textops.sequence_pack(
        _t(spark, sf_dir, "documents"), budget=512
    ).orderBy("doc_id")


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/textops.py
    benchmark_contamination): flag documents sharing >=1 13-gram with a
    benchmark set. The benchmark is derived deterministically from the
    corpus itself — a 27-word slice (words 4..30) of every 25th document
    — so the planted overlaps are SQL-expressible and the contaminated
    set is known: the slice sources plus their true duplicates. The
    probe is a broadcast hash join on md5(gram); per-doc grams dedup
    map-side via array_distinct before the explode — no cross join,
    no corpus-sized gram shuffle (plan pinned in test_textops.py)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.concat_ws(" ", F.slice(textops._word_list("text"), 4, 27)).alias(
            "text"
        )
    )
    out = textops.benchmark_contamination(docs, bench, n=13)
    return out.select(
        "doc_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        "contaminated",
    ).orderBy("doc_id")


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.language_id(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_score(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.fingerprint(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return simsearch.cosine_topk(queries, emb, k=5).orderBy("query_id", "rank")


def clip_align_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score alignment gate (operators/simsearch.py
    paired_cosine_filter): per-row cosine between an example's two
    embedding towers, keep iff >= 0.2 — the LAION/DataComp curation
    rule. The text tower is stood in by the next row's vector (an
    id-shift join builds the pairs; the GATE itself is one map-only
    zip_with projection, which is the part that must ride the scan at
    100 TB). Oracle: index-join dot/norms over the unnested arrays."""
    from smart_crawler_spark.operators.simsearch import (
        paired_cosine_filter,
    )

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    txt = emb.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("v").alias("txt_v")
    )
    pairs = emb.join(txt, "vec_id")
    out = paired_cosine_filter(pairs, "v", "txt_v", threshold=0.2)
    return out.select("vec_id", "align_cos", "keep").orderBy("vec_id")


def embedding_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection (operators/simsearch.py
    embedding_outliers): centroid-distance z-score with planted
    off-manifold rows (every 100th vector re-enters scaled x3 under a
    shifted id — ~3x the typical centroid distance, unambiguously
    past the z >= 2 gate). Two corpus scans, zero corpus-keyed
    shuffles; the oracle recomputes centroid, distances, and the
    z-normalizer from the identical plant."""
    from smart_crawler_spark.operators.simsearch import embedding_outliers

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") % 100 == 7).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 3.0).alias(
            "embedding"
        ),
    )
    corpus = emb.unionByName(planted).localCheckpoint(eager=True)
    return embedding_outliers(corpus, z_threshold=2.0).orderBy("vec_id")


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via the scale plan (no cross join, no input
    cap): hyperplane-LSH band buckets generate candidates, exact cosine
    verifies (operators/simsearch.py:embedding_near_dup_lsh). The corpus
    is the full embeddings table plus planted near-dups
    (w_i = v_i + 0.18*v_{i+1}, cos ~ 0.98) — the raw table's random
    vectors top out at cos ~ 0.5, so a 0.95-threshold near-dup set would
    otherwise be vacuously empty. Banding is 24 bands x 12 bits: at
    cos >= 0.95 (p_bit ~ 0.93) recall is ~1-2e-6 per pair, while 4096
    buckets/band keep candidate volume near the true-pair count — at
    10k vectors this runs ~40x faster than coarse 16x4 banding (whose
    625-vector buckets explode into ~50M candidate pairs). Output
    equals the brute-force pair set (the DuckDB oracle)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = _planted_query_vecs(spark, sf_dir, n=None)
    # the LSH operator scans its corpus several times (two banded sides
    # + one id-only vector re-join per side); a real deployment's corpus
    # is a parquet/Iceberg table where each scan is column-pruned, but
    # THIS corpus is a computed self-join plan — materialize it once so
    # the operator's scans don't re-run the planting join
    corpus = emb.unionByName(planted).localCheckpoint(eager=True)
    return simsearch.embedding_near_dup_lsh(
        corpus, threshold=0.95, bands=24, bits_per_band=12, dim=64
    ).orderBy("id_a", "id_b")


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 600s starts a new session; count + span per user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    sess = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 600), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


def word_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators on array columns (SURVEY §2.6: union/intersect/
    except over schema sets)."""
    vocab = ["spark", "window", "join", "hash", "table", "stream"]
    docs = _t(spark, sf_dir, "documents")
    ws = textops.word_set("text")
    varr = F.array(*[F.lit(w) for w in vocab])
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.size(F.array_intersect(ws, varr)).alias("n_vocab_hits"),
        F.size(F.array_except(ws, varr)).alias("n_other"),
        F.size(F.array_union(ws, varr)).alias("n_union"),
    ).orderBy("doc_id")


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


def asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each order ⋈ latest event of its (synthetic) user at
    or before the order date (Spark lacks ASOF; union+window pattern)."""
    from smart_crawler_spark.operators.relational import asof_join

    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 5000)
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 50).alias("user_id"),
            F.col("o_orderdate"),
        )
    )
    events = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = asof_join(
        orders, events, key="user_id", left_ts="o_orderdate", right_ts="ts",
        right_cols=["event_id", "event_type"],
    )
    return out.select(
        "o_orderkey", "user_id", "event_id", "event_type"
    ).orderBy("o_orderkey")


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_crawler_spark.operators.relational import pivot_counts

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    kinds = ["click", "view", "purchase", "error"]
    return pivot_counts(ev, "user_id", "event_type", kinds).orderBy("user_id")


def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup, oracle-checked: candidates from banded
    signatures, verified by exact shingle-set Jaccard — the same
    similarity the signatures approximate, so the output equals the
    brute-force >=0.8 pair set (banding recall ~1-2e-4 per borderline
    pair at 16 bands x 4 rows; exact-dup pairs are recall-1 by
    construction). Doubled corpus plants an exact partner per doc."""
    docs = _doubled_docs(spark, sf_dir).filter(
        (F.col("doc_id") % 100000) < 1000
    )
    return minhash.minhash_near_dup_pairs(
        docs, threshold=0.8, num_perm=64, bands=16
    ).orderBy("id_a", "id_b")


def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> dedup GROUPS: connected components over the
    MinHash-LSH pair graph (component = min reachable doc_id), every
    doc labelled, singletons included — the survivor-set shape an
    exact-once training-data dedup needs. Oracle recomputes the exact
    >=0.8-Jaccard edge set in SQL and walks it with a recursive CTE, so
    the component labelling must match exactly (the LSH config is
    recall-1.0 at gate scale, same as minhash_near_dup)."""
    docs = _doubled_docs(spark, sf_dir).filter(
        (F.col("doc_id") % 100000) < 1000
    )
    pairs = minhash.minhash_near_dup_pairs(
        docs, threshold=0.8, num_perm=64, bands=16
    )
    return dedup_groups(pairs, docs).orderBy("doc_id")


def near_dup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as near_dup_components, solved by the alternating
    large-star/small-star algorithm (operators/components.py
    connected_components_star, Kiveris et al. SoCC'14) — the
    diameter-independent O(log^2 n)-round variant for adversarial pair
    graphs where min-label propagation would do O(diameter) rounds.
    Shares the recursive-CTE oracle shape, so the gate proves both
    component implementations against the same exact edge set."""
    from smart_crawler_spark.operators.components import (
        connected_components_star,
    )

    docs = _doubled_docs(spark, sf_dir).filter(
        (F.col("doc_id") % 100000) < 1000
    )
    pairs = minhash.minhash_near_dup_pairs(
        docs, threshold=0.8, num_perm=64, bands=16
    )
    comp = connected_components_star(
        pairs.select("id_a", "id_b"),
        nodes=docs.select("doc_id"),
        src="id_a",
        dst="id_b",
        node_col="doc_id",
    )
    return comp.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    ).orderBy("doc_id")


def incremental_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus incremental dedup (operators/minhash.py
    incremental_near_dup): the corpus LSH index is probed by a synthetic
    incoming batch built deterministically from the corpus itself —
    exact copies (every 5th doc), truncated near-copies (every 7th doc
    with >=30 words, last ~1/12 of the words dropped, true Jaccard
    ~0.89 so both the 0.8 threshold and the 16x4 banding recall hold
    with margin), and word-reversed novel docs (every 11th; reversal
    destroys the trigram shingles, Jaccard ~0). Every batch row comes
    back flagged with its best corpus match; the DuckDB oracle
    recomputes exact batch x corpus shingle Jaccard brute-force."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = textops._word_list("text")
    n = F.size(w)
    keep = (n - F.floor(n / 12) - 1).cast("int")
    exact = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    trunc = docs.filter((F.col("doc_id") % 7 == 0) & (n >= 30)).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 1, keep)).alias("text"),
    )
    rev = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(w)).alias("text"),
    )
    batch = exact.unionAll(trunc).unionAll(rev)
    out = minhash.incremental_near_dup(
        docs, batch, threshold=0.8, num_perm=64, bands=16
    )
    return out.select(
        "doc_id",
        "is_dup",
        F.coalesce("dup_of", F.lit(-1)).alias("dup_of"),
        F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
    ).orderBy("doc_id")


def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup, oracle-checked end-to-end: the md5-derived
    token hash (operators/minhash.py:_md5_token_hash) is reproducible in
    SQL, so DuckDB recomputes every signature from raw text and takes
    exact all-pairs hamming — block-LSH recall is guaranteed by the
    pigeonhole blocks (max_hamming+1), so the sets must be equal."""
    docs = _doubled_docs(spark, sf_dir).filter((F.col("doc_id") % 100000) < 1000)
    return minhash.simhash_near_dup_pairs(docs, max_hamming=3).orderBy(
        "id_a", "id_b"
    )


def lsh_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path, oracle-checked vs brute-force cosine top-k:
    16 bands x 3 bits give empirical recall 1.0 on this corpus (fixed
    hyperplane seed => deterministic), so the bucketed result equals the
    exact result; production configs trade bands for recall."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return simsearch.lsh_bucketed_topk(
        queries, emb, k=5, bands=16, bits_per_band=3, dim=64
    ).orderBy("query_id", "rank")


def _planted_query_vecs(
    spark: SparkSession, sf_dir: str, n: int | None = 5
) -> DataFrame:
    """Deterministic near-neighbor queries: w_i = v_i + 0.18*v_{i+1}
    (double arithmetic, reproducible bit-exactly in SQL). cos(w_i, v_i)
    ~ 0.98 >> the corpus' random-pair ceiling (~0.5), so each query has
    one unambiguous nearest neighbor — the regime ANN exists for.
    ``n=None`` plants over every consecutive pair (the near-dup corpus).
    The ONE definition of the planting formula — its DuckDB oracles must
    stay bit-identical to this expression."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    a, b = emb.alias("a"), emb.alias("b")
    joined = a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
    if n is not None:
        joined = joined.filter(F.col("a.vec_id") < n)
    return joined.select(
        (F.col("a.vec_id") + 100000).alias("vec_id"),
        F.zip_with(
            "a.embedding", "b.embedding", lambda x, y: x + F.lit(0.18) * y
        ).alias("embedding"),
    )


def ivf_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, oracle-checked vs brute force: deterministic coarse
    quantizer (stride-seeded Lloyd iterations as DataFrame aggs),
    inverted-file cell join, n_probe nearest cells per query
    (operators/simsearch.py:ivf_topk). Queries are planted near-neighbor
    probes (w_i = v_i + 0.18*v_{i+1}) whose true top-1 lands in a probed
    cell — 4 of 16 cells scanned, exact answer recovered."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = _planted_query_vecs(spark, sf_dir)
    return simsearch.ivf_topk(
        queries, emb, k=1, n_cells=16, n_probe=4
    ).orderBy("query_id")


def pq_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN (ADC scan + exact rescore), oracle-checked vs brute
    force: deterministic per-subspace Lloyd codebooks (m=8 subspaces x
    32 codes over dim 64 = 8 B/vector, 32x compression), corpus scanned
    as codes only with per-query (m x k) lookup tables, per-partition
    top-k, exact cosine rerank of the winners
    (operators/simsearch.py:pq_topk). Queries are the same planted
    near-neighbor probes as the IVF/LSH gates; the oracle is the exact
    brute-force top-1, so a quantizer too coarse to rank the planted
    neighbor first fails the gate."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = _planted_query_vecs(spark, sf_dir)
    return simsearch.pq_topk(
        queries, emb, k=1, m=8, n_codes=32
    ).orderBy("query_id")


def ivfpq_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (the FAISS composition), oracle-checked vs brute
    force: coarse cells from the deterministic stride-seeded Lloyd,
    sphere residuals product-quantized (m=8 x 32 codes,
    normalize=False), queries probe 4/16 cells, ADC = q-dot-centroid +
    residual lookup tables, ADC top-8 rescored with the exact cosine
    and cut to k=1 (operators/simsearch.py:ivfpq_topk). Same planted
    near-neighbor probes and brute-force oracle as the IVF/PQ gates —
    a coarse-or-distorted quantizer that loses the planted neighbor
    fails the gate."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = _planted_query_vecs(spark, sf_dir)
    return simsearch.ivfpq_topk(
        queries, emb, k=1, n_cells=16, n_probe=4, m=8, n_codes=32
    ).orderBy("query_id")


def q4_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS): orders with >=1 deep-discount lineitem,
    counted per priority — the seen-set membership shape (§2.6 anti/semi
    join) on the TPC-H-ish tables."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.08)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def table_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-level set ops (SURVEY §2.6: union/intersect/exceptAll
    on DataFrames — schema union ModelPageClass.java:65-79)."""
    a = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    b = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    return (
        a.intersect(b)
        .withColumn("op", F.lit("intersect"))
        .unionByName(a.exceptAll(b).withColumn("op", F.lit("except")))
        .orderBy("op", "k")
    )


def outlink_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 out-link classification: explode out_links maps, broadcast-join
    the navigation model on (src_class, xpath) → pre-classified frontier
    rows with form-param decoding and deterministic link_seq
    (the real crawler operator, crawler/extract.py:extract_links)."""
    from smart_crawler_spark.crawler.extract import extract_links

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 4000)
    host = F.concat(F.lit("h"), (F.col("user_id") % 7).cast("string"), F.lit(".test"))
    base = F.concat(F.lit("http://"), host)
    eid = F.col("event_id")
    pages = ev.select(
        F.when(F.col("event_type") == "click", F.lit("detail"))
        .otherwise(F.lit("dir"))
        .alias("page_class"),
        F.lit(1).alias("class_depth"),
        F.concat(base, F.lit("/p/"), eid.cast("string")).alias("url"),
        host.alias("host"),
        F.create_map(
            F.lit("//div[@id='list']/a"),
            F.array(
                F.concat(base, F.lit("/p/"), ((eid * 2) % 9000).cast("string")),
                F.concat(base, F.lit("/p/"), ((eid * 2) % 9000 + 1).cast("string")),
            ),
            F.lit("//ul[@id='menu']/li/a"),
            F.array(F.concat(base, F.lit("/dir"), (eid % 4).cast("string"))),
            F.lit("//form[@id='q']"),
            F.array(F.concat(base, F.lit("/search>q="), (eid % 3).cast("string"))),
        ).alias("out_links"),
    )
    model = spark.createDataFrame(
        [
            ("detail", "//div[@id='list']/a", 0, "detail", 2),
            ("detail", "//ul[@id='menu']/li/a", 1, "dir", 1),
            ("dir", "//div[@id='list']/a", 0, "detail", 2),
            ("dir", "//form[@id='q']", 1, "search", 2),
        ],
        "src_class string, xpath string, edge_pos int, dst_class string,"
        " dst_depth int",
    )
    return extract_links(pages, model).select(
        "url", "host", "page_class", "class_depth", "form_params",
        "src_url", "link_seq",
    ).orderBy("src_url", "link_seq")


def xpath_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 MDL weighting: per-term idf = ln(N/df) over exploded word sets
    (the reference's ModelCostCalculator.java:52-59 idf over XPath sets,
    here over document vocabularies) + the w/(idf+1) weight."""
    docs = _t(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    words = docs.select(F.explode(textops.word_set("text")).alias("word"))
    dfs = words.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.col("n_docs").cast("double") / F.col("df"))
    return (
        dfs.crossJoin(F.broadcast(total))
        .filter(F.col("df") >= 5)
        .select(
            "word",
            "df",
            F.round(idf, 6).alias("idf"),
            F.round(F.lit(1.0) / (idf + 1), 6).alias("weight"),
        )
        .orderBy("word")
    )


def cluster_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 quality metrics as distributed aggregations: per-cluster
    purity (max-class fraction) and cohesion (-Σ p·log p, via
    ln(c) - Σ n·ln(n)/c) — ModelerEvaluator.java:107-277 formulas,
    cluster=source, true class=lang."""
    docs = _t(spark, sf_dir, "documents")
    m = (
        docs.groupBy(F.col("source").alias("cluster_id"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per = m.groupBy("cluster_id").agg(
        F.sum("n").alias("csize"),
        F.max("n").alias("mx"),
        F.sum(F.col("n") * F.log("n")).alias("nln"),
    )
    return per.select(
        "cluster_id",
        "csize",
        F.round(F.col("mx") / F.col("csize"), 6).alias("purity"),
        F.round(
            F.log(F.col("csize")) - F.col("nln") / F.col("csize"), 6
        ).alias("cohesion"),
    ).orderBy("cluster_id")


def bfs_depths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 BFS depth assignment at data scale: iterative frontier-
    expansion joins (operators/relational.py:bfs_depths) over a
    deterministic synthetic edge table."""
    from smart_crawler_spark.operators.relational import bfs_depths

    edges = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            (F.col("event_id") % 97).alias("src"),
            ((F.col("event_id") * 31 + 7) % 97).alias("dst"),
        )
        .distinct()
    )
    return bfs_depths(edges, start=0, max_depth=6).orderBy("node")


def phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image phash near-dup (operators/images.py): block LSH with the
    pigeonhole recall guarantee (max_hamming+1 blocks) + exact hamming
    verify. Planted phashes are md5-derived 64-bit values keyed by
    floor(doc_id/2) — consecutive doc pairs share a phash (hamming 0)
    while unrelated pairs sit ~32 bits apart (random separation), so
    the candidate buckets carry only true near-dups; oracle = DuckDB
    brute force over the identical md5 arithmetic. (An earlier linear
    formula accidentally planted thousands of hamming<=6 cross pairs,
    40x-ing the output and the bucket join.)"""
    from smart_crawler_spark.operators.images import phash_near_dup_pairs

    m = F.md5(F.floor(F.col("doc_id") / 2).cast("string"))
    hi = F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(m, 9, 8), 16, 10).cast("long")
    ph = _t(spark, sf_dir, "documents").select(
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("image_id"),
        F.shiftleft(hi, 32).bitwiseOR(lo).alias("phash"),
    )
    return phash_near_dup_pairs(ph, max_hamming=6).orderBy("id_a", "id_b")


def streaming_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming frontier ingestion (streaming/ingest.py):
    candidate URLs arrive as JSON files, availableNow micro-batches are
    canonicalized + hashed and deduped against the persisted seen
    snapshot inside foreachBatch (exact F1 anti-join per micro-batch,
    cross-batch state via the seen parquet). The final frontier content
    is the distinct candidate set — which the oracle states in SQL."""
    import shutil
    import tempfile

    from smart_crawler_spark.streaming.ingest import (
        read_candidate_stream,
        start_frontier_ingest,
    )

    base = tempfile.mkdtemp(prefix="stream_ingest_")
    cand_dir = f"{base}/candidates"
    try:
        ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 6000)
        n = (F.col("event_id") % 1500).cast("string")
        (
            ev.select(
                F.concat(
                    F.lit("http://h"),
                    (F.col("event_id") % 4).cast("string"),
                    F.lit(".test/p/"),
                    n,
                ).alias("url"),
                F.when(F.col("event_id") % 1500 % 3 == 0, F.lit("detail"))
                .otherwise(F.lit("dir"))
                .alias("page_class"),
                ((F.col("event_id") % 1500) % 3).cast("int").alias("class_depth"),
                F.lit(None).cast("string").alias("form_params"),
                F.col("ts").alias("event_ts"),
            )
            .repartition(24)  # >16 files => availableNow runs 2 micro-batches
            .write.mode("overwrite")
            .json(cand_dir)
        )
        q = start_frontier_ingest(
            read_candidate_stream(spark, cand_dir),
            seen_dir=f"{base}/seen",
            frontier_out=f"{base}/frontier",
            checkpoint_dir=f"{base}/ckpt",
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(f"{base}/frontier")
            .select("url", "host", "page_class", "class_depth")
            .orderBy("url")
        )
        # materialize before the temp dir disappears
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy("url")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def streaming_host_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator, oracle-checked: per-host
    cumulative URL counts + inter-arrival stats carried across
    micro-batches in applyInPandasWithState typed state
    (streaming/ingest.py:host_rate_state). Two availableNow waves with
    one shared checkpoint: wave timestamps are monotone in event_id and
    each wave is a single micro-batch, so the arrival order is the
    global time order and the final state is SQL-predictable — the
    oracle computes the same counts/first/last/mean-gap relationally.
    The second wave's emission must CONTINUE the first's counters
    (cross-batch state), which the per-host totals prove."""
    import shutil
    import tempfile

    from smart_crawler_spark.streaming.ingest import (
        host_rate_state,
        read_candidate_stream,
    )

    base = tempfile.mkdtemp(prefix="stream_rate_")
    cand_dir = f"{base}/candidates"
    ckpt = f"{base}/ckpt"
    try:
        ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 6000)
        cand = ev.select(
            F.concat(
                F.lit("http://h"),
                (F.col("event_id") % 4).cast("string"),
                F.lit(".test/p/"),
                F.col("event_id").cast("string"),
            ).alias("url"),
            F.lit("detail").alias("page_class"),
            F.lit(2).alias("class_depth"),
            F.lit(None).cast("string").alias("form_params"),
            # monotone event time: 2024-01-01 + event_id seconds
            F.timestamp_seconds(F.lit(1704067200) + F.col("event_id")).alias(
                "event_ts"
            ),
        )
        # micro-batch output goes to a parquet sink (the production
        # pattern — never accumulate batches driver-side via collect)
        sink = f"{base}/sink"

        def run_wave() -> None:
            q = (
                host_rate_state(read_candidate_stream(spark, cand_dir))
                .writeStream.foreachBatch(
                    lambda df, _id: df.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # wave 1: the early half, <=16 files => exactly one micro-batch
        cand.filter(F.col("event_ts") < F.timestamp_seconds(F.lit(1704067200 + 3000))
                    ).repartition(8).write.mode("overwrite").json(cand_dir)
        run_wave()
        cand.filter(F.col("event_ts") >= F.timestamp_seconds(F.lit(1704067200 + 3000))
                    ).repartition(8).write.mode("append").json(cand_dir)
        run_wave()

        from pyspark.sql import Window

        # latest emission per host = the row with the largest cumulative
        # counter (each wave's emission strictly grows n_urls)
        w = Window.partitionBy("host").orderBy(
            F.col("n_urls").desc(), F.col("last_ts").desc()
        )
        out = (
            spark.read.parquet(sink)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        out = out.select(
            "host",
            "n_urls",
            "first_ts",
            "last_ts",
            F.round("mean_gap_s", 4).alias("mean_gap_s"),
        ).orderBy("host").localCheckpoint(eager=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def streaming_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked late-data DROP, oracle-checked (streaming/ingest.py
    url_arrival_stats: 1-minute event-time windows, 2-minute watermark,
    append mode). Two availableNow waves share one checkpoint:

    - wave 1 arrives with event times spread over minutes 0..10, so the
      committed watermark is 10:00 - 2:00 = 8:00;
    - wave 2 plants LATE rows at minutes {0, 2} — their windows ended
      well below the restored 8:00 watermark, so Spark must drop them
      (their windows were already finalized in wave 1's append output;
      re-emission would duplicate keys and hash-mismatch) — plus
      on-time rows at minutes 9/10 that aggregate WITH wave 1's rows in
      the still-open windows, plus one far-future closer row (minute
      120) that pushes the final watermark past every real window so
      append mode flushes them all. The closer's own window stays open
      and never appears.

    The oracle states the on-time multiset in SQL: all wave-1 rows plus
    wave-2 rows marked on-time, counted per (window, host)."""
    import shutil
    import tempfile

    from smart_crawler_spark.streaming.ingest import (
        read_candidate_stream,
        url_arrival_stats,
    )

    base = tempfile.mkdtemp(prefix="stream_late_")
    cand_dir = f"{base}/candidates"
    ckpt = f"{base}/ckpt"
    out_dir = f"{base}/out"
    base_epoch = 1709251200  # 2024-03-01 00:00:00 UTC
    try:
        ev = _t(spark, sf_dir, "events")

        def cand_frame(df: DataFrame, minute) -> DataFrame:
            return df.select(
                F.concat(
                    F.lit("http://h"),
                    (F.col("event_id") % 3).cast("string"),
                    F.lit(".test/p/"),
                    F.col("event_id").cast("string"),
                ).alias("url"),
                F.lit("dir").alias("page_class"),
                F.lit(0).cast("int").alias("class_depth"),
                F.lit(None).cast("string").alias("form_params"),
                F.timestamp_seconds(
                    F.lit(base_epoch) + minute.cast("long") * 60
                ).alias("event_ts"),
            )

        def run_wave() -> None:
            q = (
                url_arrival_stats(
                    read_candidate_stream(spark, cand_dir), "1 minute"
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # wave 1: minutes 0..10 (max event 10:00 => watermark 8:00)
        w1 = cand_frame(
            ev.filter(F.col("event_id") < 200), F.col("event_id") % 11
        )
        w1.coalesce(1).write.mode("overwrite").json(cand_dir)
        run_wave()
        # wave 2: even ids late (minutes 0/2, below watermark -> drop),
        # odd ids on-time (minutes 9/10), one closer at minute 120
        w2src = ev.filter(
            (F.col("event_id") >= 200) & (F.col("event_id") < 400)
        )
        minute2 = (
            F.when(F.col("event_id") % 2 == 0, F.col("event_id") % 4)
            .when(F.col("event_id") % 4 == 1, F.lit(9))
            .otherwise(F.lit(10))
        )
        closer = cand_frame(
            spark.range(1).select(F.col("id").alias("event_id")), F.lit(120)
        ).withColumn("url", F.lit("http://closer.test/p/0"))
        cand_frame(w2src, minute2).unionByName(closer).coalesce(
            1
        ).write.mode("append").json(cand_dir)
        run_wave()

        out = (
            spark.read.parquet(out_dir)
            .select("start", "end", "host", "n_urls")
            .orderBy("start", "host")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy(
            "start", "host"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def streaming_session_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming session windows (streaming/ingest.py session_stats:
    5-minute-gap session_window, 2-minute watermark, append mode) with
    cross-batch session MERGE, oracle-checked. Two availableNow waves
    share one checkpoint:

    - wave 1 plants one event per (host, k<40) at minute
      (k%4) + 10*(k//4) — ten 4-event bursts per host separated by
      7-minute silences, so the session operator must cut ten sessions.
      Max event = minute 93 => committed watermark 91; the last burst
      (90..93, session end 98) stays OPEN in the state store, the other
      nine flush.
    - wave 2 plants on-time events at minutes 94/95 (they must merge
      into the restored open session — the cross-batch state path),
      LATE events at minute 0 (below watermark 91: dropped; re-emission
      would duplicate the first flushed session and hash-mismatch), and
      one closer per host at minute 240 that pushes the watermark past
      every real session. The closers' own session stays open and never
      appears.

    The oracle recomputes the sessions in SQL: the identical planted
    multiset minus late rows and closers, gaps-and-islands with the
    same >= 5-minute break rule, min/max+gap bounds, per-session
    counts."""
    import shutil
    import tempfile

    from smart_crawler_spark.streaming.ingest import (
        read_candidate_stream,
        session_stats,
    )

    base = tempfile.mkdtemp(prefix="stream_sess_")
    cand_dir = f"{base}/candidates"
    ckpt = f"{base}/ckpt"
    out_dir = f"{base}/out"
    base_epoch = 1709251200  # 2024-03-01 00:00:00 UTC, as late_drop
    try:
        ev = _t(spark, sf_dir, "events")

        def cand_frame(df: DataFrame, minute) -> DataFrame:
            return df.select(
                F.concat(
                    F.lit("http://h"),
                    (F.col("event_id") % 3).cast("string"),
                    F.lit(".test/p/"),
                    F.col("event_id").cast("string"),
                ).alias("url"),
                F.lit("dir").alias("page_class"),
                F.lit(0).cast("int").alias("class_depth"),
                F.lit(None).cast("string").alias("form_params"),
                F.timestamp_seconds(
                    F.lit(base_epoch) + minute.cast("long") * 60
                ).alias("event_ts"),
            )

        def run_wave() -> None:
            q = (
                session_stats(read_candidate_stream(spark, cand_dir))
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # wave 1: k = event_id // 3 in 0..39, minute (k%4) + 10*(k//4)
        k = F.floor(F.col("event_id") / 3)
        w1 = cand_frame(
            ev.filter(F.col("event_id") < 120),
            (k % 4) + 10 * F.floor(k / 4),
        )
        w1.coalesce(1).write.mode("overwrite").json(cand_dir)
        run_wave()
        # wave 2: ids 120..125 on-time (minutes 94/95 — merge into the
        # open 90..93 sessions), ids 126..131 late (minute 0 — dropped),
        # ids 132..134 closers (minute 240)
        w2src = ev.filter(
            (F.col("event_id") >= 120) & (F.col("event_id") < 135)
        )
        minute2 = (
            F.when(F.col("event_id") < 123, F.lit(94))
            .when(F.col("event_id") < 126, F.lit(95))
            .when(F.col("event_id") < 132, F.lit(0))
            .otherwise(F.lit(240))
        )
        cand_frame(w2src, minute2).coalesce(1).write.mode("append").json(
            cand_dir
        )
        run_wave()

        out = (
            spark.read.parquet(out_dir)
            .select("host", "sess_start_s", "sess_end_s", "n_events")
            .orderBy("host", "sess_start_s")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy(
            "host", "sess_start_s"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def streaming_fetch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream watermarked inner join (streaming/ingest.py
    fetch_latency_join: dispatch stream x response stream on url,
    response within 5 minutes of dispatch, 2-minute watermarks, append
    mode). Two availableNow waves share one checkpoint:

    - wave 1: a dispatch per event_id < 200 at minute id%11 (0..10);
      responses for id%3 != 0 at +1/+2 minutes (JOIN — same batch) and
      for id%3 == 0 at +7 minutes (latency > 5 min: the range condition
      excludes them even though both rows share the micro-batch). Max
      dispatch 10:00, max response 17:00 -> committed global watermark
      min(8:00, 15:00) = 8:00.
    - wave 2: responses ONLY, for the id%3 == 0 dispatches that are
      still unmatched. Dispatches at minute >= 7 are still in state
      (evictable only when watermark > dispatch+5 > 12:00 > 8:00), so
      their +2 responses (minutes 9..12, above the 8:00 watermark) JOIN
      across the batch boundary through the state store. Dispatches at
      minute < 3 were evicted (dispatch+5 < 8:00) and their +4
      responses (minutes <= 6) sit below the watermark — dropped on
      input; emitting them would duplicate nothing but joining them
      would resurrect evicted state, either way a hash mismatch.
      Minutes 3..6 are left out of wave 2: their eviction timing sits
      on the watermark boundary, and the gate only plants rows whose
      fate is unambiguous.

    The oracle states the joined multiset in SQL: wave-1 in-bound pairs
    plus wave-2 pairs whose dispatch minute >= 7."""
    import shutil
    import tempfile

    from smart_crawler_spark.streaming.ingest import (
        fetch_latency_join,
        read_candidate_stream,
        read_response_stream,
    )

    base = tempfile.mkdtemp(prefix="stream_join_")
    disp_dir = f"{base}/dispatches"
    resp_dir = f"{base}/responses"
    ckpt = f"{base}/ckpt"
    out_dir = f"{base}/out"
    base_epoch = 1709251200  # 2024-03-01 00:00:00 UTC, as late_drop
    try:
        ev = _t(spark, sf_dir, "events")
        w1 = ev.filter(F.col("event_id") < 200)
        url = F.concat(
            F.lit("http://h"),
            (F.col("event_id") % 3).cast("string"),
            F.lit(".test/p/"),
            F.col("event_id").cast("string"),
        )
        ts = lambda minute: F.timestamp_seconds(  # noqa: E731
            F.lit(base_epoch) + minute.cast("long") * 60
        )
        d_min = F.col("event_id") % 11

        def run_wave() -> None:
            q = (
                fetch_latency_join(
                    read_candidate_stream(spark, disp_dir),
                    read_response_stream(spark, resp_dir),
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # wave 1: every dispatch + in-bound/out-of-bound responses
        w1.select(
            url.alias("url"),
            F.lit("dir").alias("page_class"),
            F.lit(0).cast("int").alias("class_depth"),
            F.lit(None).cast("string").alias("form_params"),
            ts(d_min).alias("event_ts"),
        ).coalesce(1).write.mode("overwrite").json(disp_dir)
        r1_min = F.when(
            F.col("event_id") % 3 != 0,
            d_min + 1 + F.col("event_id") % 2,
        ).otherwise(d_min + 7)
        w1.select(
            url.alias("url"),
            F.when(F.col("event_id") % 7 == 0, 404)
            .otherwise(200)
            .cast("int")
            .alias("status"),
            ts(r1_min).alias("event_ts"),
        ).coalesce(1).write.mode("overwrite").json(resp_dir)
        run_wave()

        # wave 2: responses only, for the still-unmatched id%3 == 0
        # dispatches outside the watermark gray zone
        w2 = w1.filter(
            (F.col("event_id") % 3 == 0)
            & ((d_min >= 7) | (d_min < 3))
        )
        r2_min = F.when(d_min >= 7, d_min + 2).otherwise(d_min + 4)
        w2.select(
            url.alias("url"),
            F.lit(200).cast("int").alias("status"),
            ts(r2_min).alias("event_ts"),
        ).coalesce(1).write.mode("append").json(resp_dir)
        run_wave()

        out = spark.read.parquet(out_dir).select(
            "url", "host", "dispatch_s", "response_s", "latency_s", "status"
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy("url")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def streaming_static_enrich(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-static LEFT join (streaming/ingest.py
    enrich_with_static): candidates enriched per micro-batch with a
    per-host profile dimension (broadcast; no state, no watermark).
    Hosts h0/h1/h2 carry planted profile rows; every 7th candidate
    lands on UNPROFILED host h9 and must keep null profile columns
    (left semantics). One availableNow wave — the static-join path has
    no cross-batch state to pin."""
    import shutil
    import tempfile

    from smart_crawler_spark.streaming.ingest import (
        enrich_with_static,
        read_candidate_stream,
    )

    base = tempfile.mkdtemp(prefix="stream_enrich_")
    cand_dir = f"{base}/candidates"
    ckpt = f"{base}/ckpt"
    out_dir = f"{base}/out"
    base_epoch = 1709251200  # 2024-03-01 00:00:00 UTC, as late_drop
    try:
        ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
        hostnum = F.when(
            F.col("event_id") % 7 == 0, F.lit(9)
        ).otherwise(F.col("event_id") % 3)
        ev.select(
            F.concat(
                F.lit("http://h"),
                hostnum.cast("string"),
                F.lit(".test/p/"),
                F.col("event_id").cast("string"),
            ).alias("url"),
            F.lit("dir").alias("page_class"),
            F.lit(0).cast("int").alias("class_depth"),
            F.lit(None).cast("string").alias("form_params"),
            F.timestamp_seconds(
                F.lit(base_epoch) + F.col("event_id")
            ).alias("event_ts"),
        ).coalesce(1).write.mode("overwrite").json(cand_dir)

        profile = spark.createDataFrame(
            [
                ("h0.test", "news", 3),
                ("h1.test", "shop", 1),
                ("h2.test", "forum", 2),
            ],
            "host string, host_class string, crawl_priority int",
        )
        q = (
            enrich_with_static(
                read_candidate_stream(spark, cand_dir), profile
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        out = spark.read.parquet(out_dir).select(
            "url", "host", "ts_s", "host_class", "crawl_priority"
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy("url")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def streaming_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (streaming/ingest.py
    dedup_within_watermark: dropDuplicatesWithinWatermark on url,
    2-minute delay, append mode). Two availableNow waves on one
    checkpoint:

    - wave 1: each url id < 200 arrives 1 + id%2 times, every copy
      byte-identical at minute id%11 (identical copies make the
      kept-row deterministic regardless of partition order within the
      batch) — exactly one row per url emits. A closer at minute 60
      pushes the committed watermark to 58 and the trailing no-data
      batch evicts every real key's state (ts + 2 < 58).
    - wave 2: re-arrivals at minute 59 for id%5 == 0 — their state
      expired, so they EMIT AGAIN (the bounded-state contract: state
      is O(keys per watermark window), not O(keys ever seen)); within
      wave 2 each re-arrival lands twice (identical copies — the dup
      is dropped); and id%5 == 1 urls re-arrive at minute 0, below the
      58 watermark — dropped as late, no row.

    Oracle: one row per url at its wave-1 minute, plus the closer, plus
    one minute-59 row per id%5 == 0 url."""
    import shutil
    import tempfile

    from smart_crawler_spark.streaming.ingest import (
        dedup_within_watermark,
        read_candidate_stream,
    )

    base = tempfile.mkdtemp(prefix="stream_ttl_")
    cand_dir = f"{base}/candidates"
    ckpt = f"{base}/ckpt"
    out_dir = f"{base}/out"
    base_epoch = 1709251200  # 2024-03-01 00:00:00 UTC, as late_drop
    try:
        ev = _t(spark, sf_dir, "events")
        w1 = ev.filter(F.col("event_id") < 200)
        url = F.concat(
            F.lit("http://h"),
            (F.col("event_id") % 3).cast("string"),
            F.lit(".test/p/"),
            F.col("event_id").cast("string"),
        )
        ts = lambda minute: F.timestamp_seconds(  # noqa: E731
            F.lit(base_epoch) + minute.cast("long") * 60
        )

        def cand(df: DataFrame, minute) -> DataFrame:
            return df.select(
                url.alias("url"),
                F.lit("dir").alias("page_class"),
                F.lit(0).cast("int").alias("class_depth"),
                F.lit(None).cast("string").alias("form_params"),
                ts(minute).alias("event_ts"),
            )

        def run_wave() -> None:
            q = (
                dedup_within_watermark(
                    read_candidate_stream(spark, cand_dir)
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # wave 1: identical copies (1 + id%2 each) + one closer
        dup = cand(
            w1.filter(F.col("event_id") % 2 == 1), F.col("event_id") % 11
        )
        closer = cand(
            spark.range(1).select(F.lit(0).alias("event_id")), F.lit(60)
        ).withColumn("url", F.lit("http://closer.test/p/0"))
        cand(w1, F.col("event_id") % 11).unionByName(dup).unionByName(
            closer
        ).coalesce(1).write.mode("overwrite").json(cand_dir)
        run_wave()

        # wave 2: expired-state re-arrivals (twice each, identical) +
        # late re-arrivals below the watermark
        re5 = w1.filter(F.col("event_id") % 5 == 0)
        late = cand(w1.filter(F.col("event_id") % 5 == 1), F.lit(0))
        cand(re5, F.lit(59)).unionByName(cand(re5, F.lit(59))).unionByName(
            late
        ).coalesce(1).write.mode("append").json(cand_dir)
        run_wave()

        out = spark.read.parquet(out_dir).select("url", "host", "ts_s")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy(
            "url", "ts_s"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def streaming_fetch_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream join — the fetch-TIMEOUT path
    (streaming/ingest.py fetch_latency_join how='left_outer'): a
    dispatch that never got an in-bound response emits one
    null-response row exactly when its join state is evicted. Two
    availableNow waves on one checkpoint:

    - wave 1: dispatches at minute id%11 for id < 200; responses at
      +1/+2 for id%3 != 0 only (they emit matched rows in-batch).
      Unmatched dispatches (id%3 == 0) stay in state — the watermark
      inside wave 1's single batch is still 0, so NO null emits yet.
      Committed watermark after the wave: min(10, 12) - 2 = 8.
    - wave 2: one closer per stream (fresh urls, minute 60) pushes the
      watermark to 58:00, and the engine's trailing NO-DATA micro-batch
      (the append-mode state-flush pass) evicts every real dispatch
      (minute + 5 < 58) — so each of the 67 unmatched dispatches emits
      exactly one null-response TIMEOUT row, while previously-MATCHED
      dispatches must NOT re-emit (the engine's per-row matched flag).
      The closers' own rows (60 + 5 > 58) stay open and never emit.

    The oracle states both parts in SQL: the matched multiset plus one
    null-response row per id%3 == 0 dispatch."""
    import shutil
    import tempfile

    from smart_crawler_spark.streaming.ingest import (
        fetch_latency_join,
        read_candidate_stream,
        read_response_stream,
    )

    base = tempfile.mkdtemp(prefix="stream_timeout_")
    disp_dir = f"{base}/dispatches"
    resp_dir = f"{base}/responses"
    ckpt = f"{base}/ckpt"
    out_dir = f"{base}/out"
    base_epoch = 1709251200  # 2024-03-01 00:00:00 UTC, as late_drop
    try:
        ev = _t(spark, sf_dir, "events")
        w1 = ev.filter(F.col("event_id") < 200)
        url = F.concat(
            F.lit("http://h"),
            (F.col("event_id") % 3).cast("string"),
            F.lit(".test/p/"),
            F.col("event_id").cast("string"),
        )
        ts = lambda minute: F.timestamp_seconds(  # noqa: E731
            F.lit(base_epoch) + minute.cast("long") * 60
        )
        d_min = F.col("event_id") % 11

        def run_wave() -> None:
            q = (
                fetch_latency_join(
                    read_candidate_stream(spark, disp_dir),
                    read_response_stream(spark, resp_dir),
                    how="left_outer",
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        w1.select(
            url.alias("url"),
            F.lit("dir").alias("page_class"),
            F.lit(0).cast("int").alias("class_depth"),
            F.lit(None).cast("string").alias("form_params"),
            ts(d_min).alias("event_ts"),
        ).coalesce(1).write.mode("overwrite").json(disp_dir)
        w1.filter(F.col("event_id") % 3 != 0).select(
            url.alias("url"),
            F.when(F.col("event_id") % 7 == 0, 404)
            .otherwise(200)
            .cast("int")
            .alias("status"),
            ts(d_min + 1 + F.col("event_id") % 2).alias("event_ts"),
        ).coalesce(1).write.mode("overwrite").json(resp_dir)
        run_wave()

        # wave 2: closers only (fresh urls on both streams at minute
        # 60) — the batch they force runs under the restored watermark
        closer = spark.range(1)
        closer.select(
            F.lit("http://closer.test/d").alias("url"),
            F.lit("dir").alias("page_class"),
            F.lit(0).cast("int").alias("class_depth"),
            F.lit(None).cast("string").alias("form_params"),
            ts(F.lit(60)).alias("event_ts"),
        ).coalesce(1).write.mode("append").json(disp_dir)
        closer.select(
            F.lit("http://closer.test/r").alias("url"),
            F.lit(200).cast("int").alias("status"),
            ts(F.lit(60)).alias("event_ts"),
        ).coalesce(1).write.mode("append").json(resp_dir)
        run_wave()

        out = spark.read.parquet(out_dir).select(
            "url", "host", "dispatch_s", "response_s", "latency_s", "status"
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema).orderBy("url")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct estimation (§2.6: approx_count_distinct at
    10^10 scale, where exact countDistinct would shuffle every key).
    Oracle-checked as a tolerance assertion: the HLL estimate itself is
    engine-specific, so the output carries the exact count plus
    ``hll_ok`` = |approx-exact|/exact <= 5*rsd; the oracle states the
    exact counts and hll_ok=true — any estimator drift beyond tolerance
    hash-mismatches the gate."""
    ev = _t(spark, sf_dir, "events")
    rsd = 0.02
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("_approx"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(5 * rsd)  # 5σ of the configured rsd — the gate
                # tracks the config instead of a hardcoded constant
            ).alias("hll_ok"),
        )
        .orderBy("event_type")
    )


_ROBOTS_TEXTS = {
    "h0.test": "User-agent: *\nDisallow: /p/\nAllow: /p/1",
    "h1.test": "User-agent: *\nDisallow: /p/7$",
    "h3.test": "User-agent: *\nDisallow: /",
    "h4.test": "User-agent: *\nAllow: /p/\nDisallow: /p/",
}


def robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt enforcement (frontier/robots.py): RFC 9309
    longest-match allow/disallow evaluated in a vectorized Arrow UDF over
    synthesized frontier URLs; oracle replicates the longest-match
    decision relationally (prefix + exact rules, allow wins ties)."""
    from smart_crawler_spark.frontier.robots import RobotsPolicy, filter_allowed

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    url = F.concat(
        F.lit("http://h"),
        (F.col("user_id") % 5).cast("string"),
        F.lit(".test"),
        F.when(F.col("event_id") % 11 == 0, F.lit("/")).otherwise(
            F.concat(F.lit("/p/"), F.col("event_id").cast("string"))
        ),
        F.when(
            F.col("event_id") % 7 == 0,
            F.concat(F.lit("?k="), (F.col("event_id") % 3).cast("string")),
        ).otherwise(F.lit("")),
    )
    df = ev.select(
        "event_id",
        url.alias("url"),
        F.concat(
            F.lit("h"), (F.col("user_id") % 5).cast("string"), F.lit(".test")
        ).alias("host"),
    )
    policy = RobotsPolicy(_ROBOTS_TEXTS)
    return filter_allowed(df, policy).orderBy("event_id", "url")


def image_decode_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-payload pipeline (input_hint axis): generate the
    deterministic mixed PNG/JPEG corpus distributed (mapInPandas),
    decode every payload in Arrow-batched UDFs (pure-numpy codecs:
    functions/png.py, functions/jpeg.py), recompute dims + phash, and
    check the per-row invariant (operators/images.py:
    verify_decode_invariant). The oracle predicts the outcome from the
    generation rule: every row decodes and verifies — PNG exactly
    (lossless), JPEG at quality 98 where the roundtrip stays >= 40 dB
    and the 8x8 average-phash is bit-identical (measured, deterministic
    corpus)."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import verify_decode_invariant

    corpus = generate_images(spark, 500, jpeg_every=10)
    return (
        verify_decode_invariant(corpus)
        .select(
            "image_id", "fmt", "ok",
            F.coalesce("invariant_ok", F.lit(False)).alias("invariant_ok"),
        )
        .orderBy("image_id")
    )


def image_patch_verify_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch pipeline round trip (operators/images.py
    extract_patches + reassemble_verify): decode each image once inside
    the Arrow batch, cut into 8x8 tiles, SHUFFLE the tiles keyed by
    image_id (the patches-as-sequence layout a vision trainer
    consumes), rebuild the pixel array per group, and compare its md5
    against an independent decode of the original payload. The oracle
    predicts the grid size from the datagen dims rule (w, h are
    multiples of 8, so the grid tiles exactly) and that every rebuild
    is byte-exact (PNG lossless; JPEG decode deterministic)."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import reassemble_verify

    corpus = generate_images(spark, 500, jpeg_every=10)
    return reassemble_verify(corpus, patch=8).orderBy("image_id")


def watermark_detect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark/logo mining (operators/images.py watermark_patches):
    every 7th image carries the fixed 8x8 _LOGO tile at patch cell
    (1,1); the miner hashes every tile (no pixel bytes in the shuffle),
    finds hashes recurring across >=5 distinct images via one
    map-side-partial distinct-count agg, and broadcast-joins the hot
    set back. The plant survives BOTH formats: PNG rows keep exact logo
    bytes, and all JPEG plants decode the block-aligned tile to one
    other byte pattern (4:4:4, per-block DCT) — so the miner finds two
    hot hash groups and the oracle predicts per-format n_images from
    the plant rule (i%7==6; fmt by i%10==9). Any false-positive noise
    tile or missed plant breaks row count or hash."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import watermark_patches

    corpus = generate_images(spark, 500, jpeg_every=10, logo_every=7)
    return (
        watermark_patches(corpus, patch=8, min_images=5)
        .select("image_id", "py", "px", "n_images")
        .orderBy("image_id")
    )


def watermark_detect_perceptual_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-key watermark mining (operators/images.py
    _perceptual_tiles): same plan as watermark_detect but tiles are
    keyed by the 48-bit sign pattern (per-channel 4x4 block means vs
    tile mean), which is invariant to the q98 JPEG decode noise — so
    the png and jpeg plants of the one _LOGO overlay merge into a
    SINGLE hot group and the oracle predicts n_images as the TOTAL
    plant count (the cross-encoder case exact-byte keying cannot
    reach; the logo's >=10 block-mean margin vs <=3 decode noise makes
    the merge deterministic)."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import watermark_patches

    corpus = generate_images(spark, 500, jpeg_every=10, logo_every=7)
    return (
        watermark_patches(corpus, patch=8, min_images=5, key="perceptual")
        .select("image_id", "py", "px", "n_images")
        .orderBy("image_id")
    )


def image_augment_verify_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic augmentation with an exact inverse check
    (operators/images.py augment_images + augment_verify): hflip and
    rot90 each image, re-encode losslessly, then decode the augmented
    PNG, invert the transform, and hash-compare against an independent
    decode of the original (equi-join on image_id — the two pixel
    streams never share a task). The oracle predicts the dim swap
    (rot90: (w,h)->(h,w)) from the datagen rule and ok=true everywhere
    (index permutations + lossless re-encode are byte-exact even for
    JPEG sources, whose decode is deterministic)."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import augment_verify

    corpus = generate_images(spark, 500, jpeg_every=10)
    return augment_verify(corpus, augs=("hflip", "rot90")).orderBy(
        "image_id", "aug"
    )


def _video_sample_verified(spark: SparkSession, fmt: str) -> DataFrame:
    from smart_crawler_spark.datagen.images import (
        generate_videos,
        video_frame_pixels,
    )
    from smart_crawler_spark.functions.png import decode_png, psnr
    from smart_crawler_spark.operators.images import sample_frames

    vids = generate_videos(spark, 60, n_frames=12, fmt=fmt)
    sampled = sample_frames(vids, every_n=5)

    import pandas as pd

    def verify(batches):
        for pdf in batches:
            rows = []
            for vid, fno, data, w, h in zip(
                pdf["video_id"], pdf["frame_no"], pdf["bytes"], pdf["w"], pdf["h"]
            ):
                ref = video_frame_pixels(int(vid[3:]), int(fno), int(w), int(h))
                got = decode_png(bytes(data))
                rows.append(
                    {
                        "video_id": vid,
                        "frame_no": int(fno),
                        "w": int(w),
                        "h": int(h),
                        "psnr_ok": bool(psnr(ref, got) >= 40.0),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_no", "w", "h", "psnr_ok"]
            )

    return sampled.mapInPandas(
        verify, "video_id string, frame_no int, w int, h int, psnr_ok boolean"
    ).orderBy("video_id", "frame_no")


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-payload pipeline: deterministic uncompressed .y4m clips
    generated distributed, every-5th frame sampled + decoded in
    Arrow-batched mapInPandas (operators/images.py:sample_frames,
    functions/y4m.py), each sampled frame verified against the reference
    pixel generator at PSNR>=40dB (YCbCr 4:4:4 quantization roundtrips
    ~48 dB). The oracle predicts the sampled (video, frame) grid and the
    invariant outcome from the generation rule."""
    return _video_sample_verified(spark, "y4m")


def video_frame_sample_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED video leg: the same sampling pipeline over AVI/MJPEG
    clips (functions/mjpeg.py — real RIFF container, each frame a real
    baseline JPEG from functions/jpeg.py at q98). Sampled frames decode
    through container + entropy + DCT and must still hit the per-frame
    PSNR>=40dB invariant vs the reference pixel generator (~43.6 dB
    measured), closing the compressed-codec gate honestly — inter-frame
    codecs (h264) remain NotImplementedError."""
    return _video_sample_verified(spark, "mjpeg")


def image_metadata_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded-metadata audit (operators/images.py metadata_audit):
    parse tEXt chunks from PNG payloads, one row per entry. The datagen
    plants an Author (PII-looking email) + Software pair on every 3rd
    PNG row (text_meta_every=3; JPEG rows i%10==9 carry none), so the
    oracle predicts the full key/value table closed-form."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import metadata_audit

    corpus = generate_images(spark, 500, jpeg_every=10, text_meta_every=3)
    return metadata_audit(corpus).orderBy("image_id", "key")


def image_metadata_strip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata strip with pixel-preservation proof (operators/images.py
    strip_metadata_verify): every PNG re-emitted with only critical
    chunks, decoded pixels compared byte-for-byte against the original
    decode. Oracle: planted rows show n_before=2 -> n_after=0, all
    others 0 -> 0, pixels_ok everywhere."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import strip_metadata_verify

    corpus = generate_images(spark, 500, jpeg_every=10, text_meta_every=3)
    return strip_metadata_verify(corpus).orderBy("image_id")


def video_scene_cuts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection (operators/images.py scene_cuts):
    adjacent-frame mean-absolute-difference over REAL decoded frames,
    cut where MAD > 16. The datagen plants scene structure
    (datagen/images.py scene_frame_pixels: scene length 4 + vid%3,
    +2-per-frame in-scene brightness drift, independent draws across
    scenes) on a MIXED corpus — y4m for vid%5 != 4, AVI/MJPEG q98 for
    vid%5 == 4, so the threshold must also clear compressed decode
    noise. The oracle predicts every cut position closed-form from the
    plant rule: multiples of the per-video scene length below
    n_frames=12."""
    from smart_crawler_spark.datagen.images import generate_videos
    from smart_crawler_spark.operators.images import scene_cuts

    vid_num = F.substring("video_id", 4, 10).cast("int")
    y = generate_videos(spark, 60, n_frames=12, fmt="y4m", scene_every=4)
    m = generate_videos(spark, 60, n_frames=12, fmt="mjpeg", scene_every=4)
    corpus = y.filter(vid_num % 5 != 4).unionByName(
        m.filter(vid_num % 5 == 4)
    )
    return scene_cuts(corpus, threshold=16.0).orderBy(
        "video_id", "cut_frame"
    )


def _aspect_sql_case(w_expr: str, h_expr: str) -> str:
    """The aspect-bucket CASE in DuckDB SQL, generated from the SAME
    ladder constants the Spark plan bakes in (operators/images.py
    aspect_bucket_expr) — one definition, two dialects. repr() gives
    shortest-roundtrip decimals, so DuckDB parses the exact doubles the
    JVM compares against (corpus min |ln-ratio - threshold| gap is
    1.03e-2, 13 orders above any cross-engine libm ulp)."""
    import math

    from smart_crawler_spark.operators.images import DEFAULT_ASPECT_BUCKETS

    ordered = sorted(DEFAULT_ASPECT_BUCKETS, key=lambda b: b[0] / b[1])
    logs = [math.log(bw / bh) for bw, bh in ordered]
    mids = [(a + b) / 2 for a, b in zip(logs, logs[1:])]
    lr = f"ln(({w_expr})::DOUBLE / ({h_expr})::DOUBLE)"
    case = "CASE"
    for (bw, bh), mid in zip(ordered[:-1], mids):
        case += f" WHEN {lr} < {mid!r} THEN '{bw}x{bh}'"
    bw, bh = ordered[-1]
    case += f" ELSE '{bw}x{bh}' END"
    return case


def image_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDXL-style aspect-ratio bucketing for image-training batches:
    dims come from container HEADERS only (functions/headers.py — PNG
    IHDR / JPEG SOF0; never decodes pixels, so the scan is parquet-IO
    bound at 100 TB), bucket assignment is a pure Catalyst CASE chain
    over ln(w/h) midpoints (map-only, zero shuffle). Oracle re-derives
    dims from the generation rule and replays the identical thresholds
    (generated from the same constants by _aspect_sql_case)."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import aspect_buckets

    corpus = generate_images(spark, 500, jpeg_every=10)
    return aspect_buckets(corpus).orderBy("image_id")


def image_bomb_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-bomb guard (operators/images.py decode_bomb_guard): flag
    payloads whose header-declared decoded size is an attack BEFORE any
    pixel decode — every 9th corpus image is a planted 1024x768
    solid-color PNG (deflates to ~2.5 KB, ~300 decoded px per payload
    byte). Header sniff + Catalyst predicate only; the oracle predicts
    dims and both flags exactly from the plant rule."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import decode_bomb_guard

    corpus = generate_images(spark, 400, jpeg_every=10, bomb_every=9)
    return (
        decode_bomb_guard(corpus, max_megapixels=0.25, max_px_per_byte=50.0)
        .select("image_id", "w", "h", "oversize", "ratio_bomb", "keep")
        .orderBy("image_id")
    )


def image_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image quality filtering for a training pipeline: decode, compute
    luma contrast + histogram entropy, drop flat/low-information images
    (operators/images.py image_quality_stats). The corpus plants a
    solid-color image every 7th row (flat_every=7 — zero contrast, zero
    entropy, the 'tracking pixel / placeholder banner' case); the oracle
    predicts the keep/drop decision exactly from the plant rule."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import image_quality_stats

    corpus = generate_images(spark, 400, jpeg_every=10, flat_every=7)
    return (
        image_quality_stats(corpus)
        .select("image_id", "fmt", "keep")
        .orderBy("image_id")
    )


def image_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (byte-identical) image dedup: md5 over raw payload bytes,
    one map-side-partial hash aggregation + an id-only join back
    (operators/images.py exact_dup_groups — pixels never shuffle). The
    corpus plants a byte-identical duplicate every 7th row (dup_every=7:
    full content of the predecessor index, only image_id differs); the
    oracle derives the exact groups from the plant rule."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import exact_dup_groups

    corpus = generate_images(spark, 400, jpeg_every=10, dup_every=7)
    return exact_dup_groups(corpus).orderBy("image_id")


def image_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination for the image+caption corpus
    (operators/images.py benchmark_image_contamination) — the image
    twin of the 13-gram text `decontaminate`. The benchmark is every
    25th content index (c % 25 == 24) re-encoded as PNG
    (datagen/images.py benchmark_row), so a PNG corpus row leaks
    byte-exactly (md5 equi-join) while a JPEG row of the same content
    leaks only perceptually and must come out of the
    caption-md5 + phash-block LSH path; planted byte-duplicates
    (dup_every=7) of benchmark content are contaminated too. Both
    probes broadcast the bounded benchmark side; corpus pixels never
    shuffle. The oracle states the plant rule arithmetically."""
    from smart_crawler_spark.datagen.images import (
        generate_benchmark_images,
        generate_images,
    )
    from smart_crawler_spark.operators.images import (
        benchmark_image_contamination,
    )

    corpus = generate_images(spark, 400, jpeg_every=10, dup_every=7)
    bench = generate_benchmark_images(spark, 400, every=25, offset=24)
    return benchmark_image_contamination(
        corpus, bench, max_hamming=4
    ).orderBy("image_id")


def image_pyramid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution pyramid (operators/images.py image_pyramid):
    one decode per image fans out exact box-average levels 1/2/4 —
    map-only, no shuffle. Corpus dims follow the content-index rule
    (w = 32 + c%4*16, h = 24 + c%3*16 — both divisible by 4, so no
    crop), level dims are w/f x h/f, and the mean-preservation bound
    of equal-block box averaging makes mean_ok TRUE everywhere; the
    oracle states all of it arithmetically."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import image_pyramid

    corpus = generate_images(spark, 300, jpeg_every=10, dup_every=7)
    return (
        image_pyramid(corpus, factors=(1, 2, 4))
        .select("image_id", "level", "w", "h", "mean_ok")
        .orderBy("image_id", "level")
    )


def image_ingest_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental image-ingest dedup (operators/images.py
    incremental_image_dedup): a 120-row batch probes the 300-image
    corpus' joint (caption-md5 x phash-block) index — per-batch cost,
    never corpus x corpus. The batch cycles exact re-crawls (byte
    copies), cross-codec re-encodes (same pixels through the other
    codec), 2x box-downscale thumbnails (the avg-phash survives exact
    area downscale to hamming <= 8, so max_hamming=9 catches them; the
    caption in the bucket key makes false positives impossible across
    different content), and novel content (datagen/images.py
    ingest_batch_row); the oracle restates the cycle arithmetically."""
    from smart_crawler_spark.datagen.images import (
        generate_images,
        generate_ingest_batch,
    )
    from smart_crawler_spark.operators.images import (
        incremental_image_dedup,
    )

    corpus = generate_images(spark, 300, jpeg_every=10)
    batch = generate_ingest_batch(spark, 120, jpeg_every=10)
    return incremental_image_dedup(
        corpus, batch, max_hamming=9
    ).orderBy("image_id")


def caption_boilerplate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency caption boilerplate filter (operators/images.py
    caption_boilerplate): captions shared by >=3 images flag their
    rows. The 'thumb' plant (short_caption_every=5, ~100 rows) is the
    only caption above threshold — planted byte-dup pairs (dup_every=7)
    share a caption at count 2 and must stay clean, pinning the
    threshold boundary; the oracle restates both plant rules."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import caption_boilerplate

    corpus = generate_images(
        spark, 500, jpeg_every=10, dup_every=7, short_caption_every=5
    )
    return caption_boilerplate(corpus, min_images=3).orderBy("image_id")


def webdataset_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard export + re-read (sources/webdataset.py):
    the corpus packs into deterministic tar shards (shard assignment =
    shard_pack's two-phase prefix-sum layout; tar metadata pinned, so
    shard bytes are partitioning-independent), the reader explodes
    them back shard-parallel, and every sample must return with
    byte-identical image payload and caption — the oracle states the
    TRUE/TRUE invariant per image id."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.sources.webdataset import (
        webdataset_roundtrip_check,
    )

    corpus = generate_images(spark, 300, jpeg_every=10, dup_every=7)
    return webdataset_roundtrip_check(
        corpus, shard_bytes=64 * 1024
    ).orderBy("image_id")


def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (training-corpus scrub): emails, NANP phones, IPv4s
    replaced by typed placeholders + per-doc counts, all in native
    regexp_replace/regexp_count (map-only, zero Python, zero shuffle —
    operators/textops.py redact_pii). The word-soup corpus has no PII,
    so deterministic PII is planted in SQL-expressible concat arithmetic
    on doc_id; the oracle plants identically and replays the identical
    regexes (module constants)."""
    from smart_crawler_spark.operators.textops import redact_pii

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact u"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.org"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit(" call 555-010-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 2,
                F.concat(
                    F.lit(" from 10."),
                    (F.col("doc_id") % 200).cast("string"),
                    F.lit(".0."),
                    (F.col("doc_id") % 250).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(planted).orderBy("doc_id")


def line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document line-level dedup (RefinedWeb-style boilerplate
    removal): lines occurring in >=2 distinct docs are stripped from
    every doc (operators/textops.py line_dedup — two hash aggs over
    line hashes + one equi-join; no corpus-wide window). Docs are
    restructured into two lines — their leading words plus, for every
    5th doc, a planted boilerplate footer — so the operator must find
    exactly the planted line (plus any organically duplicated text); the
    oracle mirrors the line semantics relationally, not the plant."""
    from smart_crawler_spark.operators.textops import line_dedup

    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    boiler = "subscribe to our newsletter for updates"
    two_line = docs.select(
        "doc_id",
        F.concat(
            F.array_join(F.slice(words, 1, 6), " "),
            F.lit("\n"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(boiler)).otherwise(
                F.array_join(F.slice(words, 7, 6), " ")
            ),
        ).alias("text"),
    )
    return line_dedup(two_line).orderBy("doc_id")


_BM25_TERMS = ["spark", "window", "merge"]


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance top-k (operators/textops.py bm25_topk): token
    stream filtered to the query terms BEFORE any aggregation (the tf
    table is |terms|-bounded, not vocabulary-bounded), broadcast idf +
    avgdl joins, TakeOrderedAndProject top-k — no corpus sort, no
    corpus window. The oracle replays the exact Robertson idf / BM25
    formula; scores rounded to 4 dp on both sides before ranking, ties
    broken on doc_id."""
    from smart_crawler_spark.operators.textops import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=10).orderBy("rank")


def fielded_bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F over body + inbound anchor text (operators/textops.py
    fielded_bm25 — the consumer of anchor_text_agg's signal; Robertson
    et al. CIKM 2004 simple BM25F: per-field length normalization,
    shared saturation, anchor field weighted 2x). Anchors are planted
    by rule: doc j contributes one inbound anchor to dst = j - j%5
    cycling four anchor strings by j%4, so block-head docs carry 1-5
    anchors with term repetition (joint saturation under test) and
    every other doc has none (body-only scoring under test). Same
    query terms and scale shape as bm25_topk; scores rounded 4dp, ties
    on doc_id."""
    from smart_crawler_spark.operators.textops import fielded_bm25

    docs = _t(spark, sf_dir, "documents")
    anchor = F.element_at(
        F.array(
            F.lit("spark window tutorial"),
            F.lit("merge guide"),
            F.lit("window"),
            F.lit("spark spark merge"),
        ),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    anchors = docs.select(
        (F.col("doc_id") - F.col("doc_id") % 5).alias("doc_id"),
        anchor.alias("anchor"),
    )
    return fielded_bm25(docs, anchors, _BM25_TERMS, k=10).orderBy("rank")


def pca_project_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA over the embeddings table
    (operators/simsearch.py pca_fit/pca_project): ONE map-side-partial
    aggregation ships d + d(d+1)/2 moments to the driver (corpus rows
    never leave the executors), the 64x64 eigensolve runs locally with
    deterministic sign fixing, and projection is map-only JVM zip_with
    arithmetic with the components as plan literals. Verified per row
    against an independent numpy projection (Arrow-batched) plus the
    fit invariants (orthonormal components, descending explained
    variance) — generation-rule oracle: every row checks out."""
    import numpy as np
    import pandas as pd

    from smart_crawler_spark.operators.simsearch import pca_fit, pca_project

    emb = _t(spark, sf_dir, "embeddings")
    mean, comps, evar = pca_fit(emb, n_components=4)
    fit_ok = bool(
        np.allclose(comps @ comps.T, np.eye(len(comps)), atol=1e-9)
        and np.all(np.diff(evar) <= 1e-12)
        and np.all(evar >= -1e-12)
    )
    proj = pca_project(emb, mean, comps)
    pc_cols = [f"pc{i}" for i in range(len(comps))]

    def verify(batches):
        for pdf in batches:
            vecs = np.stack(pdf["embedding"].map(np.asarray)).astype(
                np.float64
            )
            want = (vecs - mean) @ comps.T
            got = pdf[pc_cols].to_numpy(dtype=np.float64)
            ok = np.all(
                np.abs(want - got) <= 1e-8 * (1 + np.abs(want)), axis=1
            )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "proj_ok": ok,
                    "fit_ok": fit_ok,
                }
            )

    joined = emb.select("vec_id", "embedding").join(proj, "vec_id")
    return joined.mapInPandas(
        verify, "vec_id long, proj_ok boolean, fit_ok boolean"
    ).orderBy("vec_id")


def charlm_ppl_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram LM perplexity quality score (CCNet-family filter,
    operators/textops.py charlm_perplexity): train add-0.5-smoothed
    trigram counts over the corpus (vocab-bounded table, broadcast
    back), score every doc by exp(-avg logprob). The oracle replays the
    identical normalization, counts, smoothing, and formula in SQL."""
    from smart_crawler_spark.operators.textops import charlm_perplexity

    docs = _t(spark, sf_dir, "documents")
    return charlm_perplexity(docs).orderBy("doc_id")


def image_caption_joint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint image+caption dedup over REAL bytes (operators/images.py
    joint_dup_groups): decode -> recomputed phash, caption-hash folded
    into the hamming-block LSH key, connected components. The corpus
    plants a full-content duplicate (pixels+caption+bytes) every 5th
    row; every other caption is unique, so the exact groups follow from
    the plant rule (pairs (i-1, i) at i%5==4, all else singletons),
    which the oracle states over range()."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import joint_dup_groups

    corpus = generate_images(spark, 300, jpeg_every=10, dup_every=5)
    return joint_dup_groups(corpus, max_hamming=6).orderBy("image_id")


def substring_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-passage dedup via winnowing fingerprints
    (operators/textops.py substring_dup_pairs; Schleimer et al. SIGMOD
    2003 selection, Lee et al. 2022 use case): every 50-char window of
    normalized text is md5-hashed JVM-side, the min of each 8-window
    run is kept (content-defined, so shared passages >= 57 chars are
    guaranteed a common fingerprint), frequency-capped, self-equi-
    joined on the fingerprint. The word-soup corpus has no long shared
    passages, so a 71-char passage keyed by floor(doc_id/20) is planted
    onto docs with doc_id%20 in (0,1) in SQL-expressible concat
    arithmetic; the oracle plants identically and replays the identical
    hash/winnow/cap/join pipeline in DuckDB list functions."""
    from smart_crawler_spark.operators.textops import substring_dup_pairs

    # deterministic gate-scale cap (same pattern as minhash/simhash):
    # the DuckDB replay is O(docs x windows) single-threaded list work
    # (~20 min at 5000 sf0.1 docs), so the ORACLED subset is bounded at
    # ~1000 docs at any sf; the operator itself is uncapped
    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 100000) < 1000
    )
    tok = F.concat(
        F.lit("k"),
        F.lpad(F.floor(F.col("doc_id") / 20).cast("string"), 6, "0"),
    )
    passage = F.concat_ws(
        " ", tok, F.lit("alpha"), tok, F.lit("bravo"), tok,
        F.lit("charlie"), tok, F.lit("delta"), tok, F.lit("echo"),
    )
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 < 2,
            F.concat(F.col("text"), F.lit(" "), passage),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return substring_dup_pairs(planted).orderBy("id_a", "id_b")


def substring_dup_verify_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass EXACT verbatim-passage dedup (operators/textops.py
    substring_dup_exact): winnowing candidates -> exact longest-common-
    substring verify in Arrow batches over the candidate pairs only.
    80 synthetic docs: pair k = docs (2k, 2k+1) built from disjoint
    md5 hex streams with a shared planted passage of length
    27 + k % 6 (>= width + window - 1 = 27 at width 20 / window 8, so
    winnowing detection is GUARANTEED) fenced by differing boundary
    chars ('q' vs 'z') so the exact LCS equals the planted length, not
    one more. The oracle states the closed form — the whole
    hash/winnow/cap/join/LCS pipeline must reproduce it exactly,
    including that NO cross-pair candidate survives (md5 streams share
    no 20-char run)."""
    from smart_crawler_spark.operators.textops import substring_dup_exact

    docs = _planted_passage_docs(spark, sf_dir)
    return (
        substring_dup_exact(docs, width=20, window=8)
        .select("id_a", "id_b", "lcs_len")
        .orderBy("id_a", "id_b")
    )


def _planted_passage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared plant for the exact-substring gates: pair k = docs
    (2k, 2k+1) from disjoint md5 pads, sharing a passage of length
    27 + k % 6 fenced by differing boundary chars ('q' vs 'z')."""
    ks = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    k = F.col("doc_id")
    plen = (F.lit(27) + k % 6).cast("int")
    passage = F.concat(
        F.md5(k.cast("string")), F.md5((k + 1000).cast("string"))
    ).substr(F.lit(1), plen)
    two = ks.select(
        k.alias("k"),
        plen.alias("plen"),
        passage.alias("p"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("side"),
    )
    fence = F.when(F.col("side") == 0, F.lit("q")).otherwise(F.lit("z"))
    pad = F.md5(
        F.concat(
            (F.col("k") + 2000 + 77 * F.col("side")).cast("string")
        )
    )
    return two.select(
        (F.col("k") * 2 + F.col("side")).alias("doc_id"),
        F.concat(pad, fence, F.col("p"), fence, F.reverse(pad)).alias(
            "text"
        ),
    )


def dup_passage_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage REMOVAL (operators/textops.py
    dup_passage_scrub — the Lee et al. 2022 treatment: keep ONE
    occurrence corpus-wide, strip the rest): over the same planted
    corpus as substring_dup_verify, every pair's passage must survive
    in doc 2k (the smaller id) and vanish from doc 2k+1, with
    n_removed = the planted length exactly; all other text unchanged.
    Detection is the two-pass exact pipeline; the removal itself is a
    candidate-volume passage join + a JVM aggregate(replace) fold —
    the oracle states the closed form."""
    from smart_crawler_spark.operators.textops import dup_passage_scrub

    docs = _planted_passage_docs(spark, sf_dir)
    return dup_passage_scrub(docs, width=20, window=8).orderBy("doc_id")


def shard_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget shard layout (operators/images.py shard_pack — the
    webdataset/tar-shard writing stage): assets stream in the
    deterministic (md5-bucket, id) order and each lands in the shard
    containing its START offset (atomic assets, bounded overflow; the
    two-phase distributed prefix sum shared with sequence_pack). Sized
    here by the documents' byte lengths so DuckDB replays the identical
    layout with one flat window cumsum (strlen = bytes)."""
    from smart_crawler_spark.operators.images import shard_pack

    docs = _t(spark, sf_dir, "documents").withColumn(
        "asset_bytes", F.octet_length("text").cast("long")
    )
    return shard_pack(
        docs, shard_bytes=65536, id_col="doc_id", size_col="asset_bytes"
    ).orderBy("doc_id")


def dsir_weight_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weights (operators/textops.py
    dsir_weights; Xie et al. 2023): hashed bag-of-words models for the
    target slice (lang='en' — the trusted-distribution stand-in) and the
    raw corpus, per-doc logw = sum of bucket log-ratios. Both model
    tables are bucket-bounded (4096 rows) broadcast joins; the oracle
    replays the md5 bucket hash, add-0.5 smoothing, and the sum in SQL."""
    from smart_crawler_spark.operators.textops import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en").orderBy("doc_id")


def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (operators/simsearch.py
    semantic_dedup; Abbas et al. 2023): k-means cells confine the
    quadratic step, n_probe=2 multi-probe assignment keeps boundary
    pairs, exact cosine verifies, keep-lowest-id decides. Corpus =
    embeddings + planted near-dups (w_i = v_i + 0.18*v_{i+1}, cos~0.98)
    so every planted row must be dropped with dup_of = its source; the
    oracle is the brute-force pair rule in SQL (exact verification makes
    the outputs equal wherever cell recall holds — gate-checked).
    Deterministic gate-scale cap (vec_id%100000 < 1000) bounds the
    DuckDB all-pairs replay at larger sf, same pattern as minhash."""
    emb = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .filter((F.col("vec_id") % 100000) < 1000)
    )
    planted = _planted_query_vecs(spark, sf_dir, n=None).filter(
        (F.col("vec_id") % 100000) < 1000
    )
    corpus = emb.unionByName(planted).localCheckpoint(eager=True)
    centroids = simsearch.ivf_centroids_kmeans(emb, n_cells=16)
    return simsearch.semantic_dedup(
        corpus, threshold=0.95, n_probe=2, centroids=centroids
    ).orderBy("vec_id")


def dedup_keep_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup DECISION a training pipeline consumes:
    MinHash-LSH pairs -> connected components -> keep = (component ==
    doc_id) survivor flag + group_size stats. Composes the oracle-green
    stages (minhash_near_dup, near_dup_components) into the survivor
    set; the oracle extends the recursive-CTE component walk with the
    same keep/size rule."""
    docs = _doubled_docs(spark, sf_dir).filter(
        (F.col("doc_id") % 100000) < 1000
    )
    pairs = minhash.minhash_near_dup_pairs(
        docs, threshold=0.8, num_perm=64, bands=16
    )
    groups = dedup_groups(pairs, docs)
    sizes = groups.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    return (
        groups.join(F.broadcast(sizes), "component")
        .select(
            "doc_id",
            "component",
            (F.col("component") == F.col("doc_id")).alias("keep"),
            "group_size",
        )
        .orderBy("doc_id")
    )


def ccnet_bucket_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: score every doc with the
    char-trigram LM (charlm_perplexity, oracle-green) and split the
    corpus at the exact 1/3 and 2/3 perplexity percentiles into
    head/middle/tail quality tiers (low perplexity = head). Thresholds
    come from F.percentile over the ROUNDED ppl column (2-row broadcast
    back), so the DuckDB oracle replays them with quantile_cont on the
    identical values — both linear-interpolation percentiles."""
    from smart_crawler_spark.operators.textops import charlm_perplexity

    ppl = charlm_perplexity(_t(spark, sf_dir, "documents"))
    cuts = ppl.agg(
        F.round(F.percentile("ppl", F.lit(1 / 3)), 4).alias("t1"),
        F.round(F.percentile("ppl", F.lit(2 / 3)), 4).alias("t2"),
    )
    return (
        ppl.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "ppl",
            F.when(F.col("ppl") <= F.col("t1"), F.lit("head"))
            .when(F.col("ppl") <= F.col("t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


def image_resize_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize end-to-end (operators/images.py resize_images):
    decode every payload (PNG exact / JPEG lossy), nearest-neighbor
    resize to 16x12, re-encode as PNG — then verify each resized
    payload against the SAME nearest-neighbor sample of the generator's
    reference pixels (exact equality for PNG sources; PSNR >= 40 dB for
    JPEG sources, whose decode error rides through the resample).
    Generation-rule oracle: every row must verify (true AS ok)."""
    from smart_crawler_spark.datagen.images import (
        generate_images,
        image_pixels,
    )
    from smart_crawler_spark.functions.png import decode_png, psnr
    from smart_crawler_spark.operators.images import resize_images

    out_w, out_h = 16, 12
    corpus = generate_images(spark, 300, jpeg_every=10)
    resized = resize_images(corpus, out_w, out_h)

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for img_id, data in zip(pdf["image_id"], pdf["bytes"]):
                idx = int(str(img_id).removeprefix("img"))
                # original dims from the generation rule
                # (datagen/images.py image_row)
                w0, h0 = 32 + (idx % 4) * 16, 24 + (idx % 3) * 16
                ref = image_pixels(idx, w0, h0)
                yi = (np.arange(out_h) * h0 // out_h).astype(int)
                xi = (np.arange(out_w) * w0 // out_w).astype(int)
                expect = ref[yi][:, xi]
                got = decode_png(bytes(data))
                ok = bool(np.array_equal(expect, got)) or (
                    psnr(expect, got) >= 40.0
                )
                rows.append({"image_id": img_id, "ok": ok})
            yield pd.DataFrame(rows, columns=["image_id", "ok"])

    return resized.mapInPandas(gen, "image_id string, ok boolean").orderBy(
        "image_id"
    )


def heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass heavy hitters (operators/textops.py heavy_hitters_topk):
    per-partition Misra-Gries summaries bound memory at ``capacity``
    counters per task (the vocabulary never has to fit anywhere), then
    ONLY the candidates are re-counted exactly and top-k'd — so the
    output is the exact top-20, which the oracle states as a plain
    GROUP BY. This corpus' vocabulary (31 words) sits far under the
    4096-counter capacity, so pass 1 is lossless here; the
    eviction/merge path is pinned by the Zipf unit test
    (tests/test_textops.py)."""
    docs = _t(spark, sf_dir, "documents")
    return textops.heavy_hitters_topk(docs, k=20, capacity=4096).orderBy(
        "rank"
    )


def quality_gate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb/Gopher-style quality filter chain (operators/textops.py
    quality_gate): language-ID + heuristic quality + duplicate-trigram
    fraction + word-count bounds fused into ONE map-only projection and
    a keep decision — the composition a production corpus scrub runs,
    with thresholds (quality >= 0.75, >= 20 words) that split this
    corpus non-trivially. The oracle fuses the language_id /
    quality_score / repetition_stats SQL and the same CASE."""
    from smart_crawler_spark.operators.textops import quality_gate

    docs = _t(spark, sf_dir, "documents")
    return quality_gate(
        docs, min_quality=0.75, max_dup_trigram=0.2, min_words=20
    ).orderBy("doc_id")


_CMS_TERMS = [
    "the", "and", "of", "to", "in", "is", "that", "with", "data", "page",
]


def cms_freq_est_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (operators/textops.py
    cms_frequency_estimates): a 4x1024 deterministic md5-hashed sketch
    built as one partial-aggregated groupBy (the distributed merge of
    per-partition sketches), point-queried for 10 fixed terms with the
    exact counts alongside. The md5 hashes make every cell
    reproducible, so the oracle replays the SKETCH ITSELF — estimates
    are gate-checked value-for-value, not by tolerance."""
    from smart_crawler_spark.operators.textops import (
        cms_frequency_estimates,
    )

    docs = _t(spark, sf_dir, "documents")
    return cms_frequency_estimates(docs, _CMS_TERMS).orderBy("term")


def fasttext_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-n-gram classifier inference
    (operators/textops.py hashed_ngram_classifier; Joulin et al. 2016):
    unigram+bigram features md5-hashed into 4096 buckets, a broadcast
    bucket-bounded weight vector, mean pooling, sigmoid — the exact
    plumbing of a production quality-classifier scoring pass. Weights
    are md5-derived so DuckDB replays inference bit-for-bit; the oracle
    rebuilds the same features, hash, weight table, and sigmoid."""
    from smart_crawler_spark.operators.textops import (
        hashed_ngram_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    return hashed_ngram_classifier(docs).orderBy("doc_id")


def compaction_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (operators/relational.py
    compaction_plan — the Iceberg rewrite_data_files / Delta OPTIMIZE
    bin-pack over the file ledger): a synthetic ledger derived from
    events (7 partitions, every 9th file already at a healthy 300 MB,
    the rest 10-92 MB small files) is packed next-fit into 128 MB
    rewrite groups; healthy files pass through as group -1. The oracle
    replays the identical exclusive-prefix-sum // target rule in SQL."""
    from smart_crawler_spark.operators.relational import compaction_plan

    ev = _t(spark, sf_dir, "events")
    ledger = ev.select(
        F.concat(
            F.lit("p"), (F.col("event_id") % 7).cast("string")
        ).alias("part"),
        F.col("event_id").alias("file_id"),
        F.when(F.col("event_id") % 9 == 0, 300)
        .otherwise(10 + F.col("event_id") % 83)
        .cast("long")
        .alias("size_mb"),
    )
    return compaction_plan(
        ledger, "part", "size_mb", "file_id", target_bytes=128
    ).orderBy("part", "file")


def crawl_budget_alloc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host fetch-quota apportionment (operators/relational.py
    proportional_allocation): 10,000 fetch slots split across the
    event hosts (host = 'h' || user_id % 53, weight = event count)
    by largest-remainder — integer div/mod arithmetic, deterministic
    remainder ranking with key tie-break, sum(alloc) == total exactly.
    The oracle replays the identical integer rule with a window."""
    from smart_crawler_spark.operators.relational import (
        proportional_allocation,
    )

    ev = _t(spark, sf_dir, "events")
    hosts = ev.groupBy(
        F.concat(F.lit("h"), (F.col("user_id") % 53).cast("string")).alias(
            "host"
        )
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return proportional_allocation(
        hosts, "host", "n_events", total=10_000
    ).orderBy("key")


def zorder_layout_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit (operators/relational.py
    zorder_key / zorder_tile_stats): interleave 12 bits of
    (user_id % 4096, event_id % 4096), bucket rows into the 256
    quadtree tiles given by the top 8 Morton bits, and report each
    tile's per-dimension min/max footprint — the footer stats a
    two-dimensional pruning scan would read. The x_span/y_span columns
    make the clustering property part of the gate: every tile must
    cover only a narrow slice of BOTH dimensions. Oracle = the same
    static bit-interleave expansion in SQL."""
    from smart_crawler_spark.operators.relational import zorder_tile_stats

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4096).alias("x"),
        (F.col("event_id") % 4096).alias("y"),
    )
    stats = zorder_tile_stats(ev, "x", "y", bits=12, tile_bits=8)
    return stats.select(
        "tile",
        "n_rows",
        "min_x",
        "max_x",
        "min_y",
        "max_y",
        (F.col("max_x") - F.col("min_x")).alias("x_span"),
        (F.col("max_y") - F.col("min_y")).alias("y_span"),
    ).orderBy("tile")


def chunk_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping document chunking (operators/textops.py
    chunk_documents): 500-char chunks, 100-char overlap — the RAG /
    encoder prep split, map-only. The oracle replays the identical
    start rule (generate_series with the same stride and tail guard)
    and substr bounds."""
    from smart_crawler_spark.operators.textops import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs).orderBy("doc_id", "chunk_id")


def jpeg_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG encode-quality forensics from the header alone
    (operators/images.py jpeg_quality_estimates): the DQT luma table is
    parsed without any pixel decode and matched against the libjpeg/IJG
    quality scaling law — the corpus's jpeg rows are encoded at q98
    (datagen JPEG_QUALITY), so the estimator must recover exactly 98
    with a byte-exact table match, and PNG rows pass through null.
    Oracle = the generation rule."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import jpeg_quality_estimates

    corpus = generate_images(spark, 400, jpeg_every=10)
    return jpeg_quality_estimates(corpus).orderBy("image_id")


def audio_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-invariant audio near-dup (operators/audio.py
    audio_fingerprint_dedup): md5 over the packed sign sequence of
    each decoded clip, grouped on the 16-byte fingerprint — gain
    changes never flip a sample's nonneg/neg side, so the planted 7/8-
    gain copies (datagen vol_every=8) merge with their source class
    while bytes/RMS/peak/checksum all differ. The corpus's sawtooth
    sign pattern depends only on the period parameter (nonneg iff
    2*(t%p) >= p-1, amplitude-independent), so the oracle predicts the
    groups closed-form: class = i%25, with every 8th clip adopting its
    source's class (i-1)%25."""
    from smart_crawler_spark.datagen.audio import generate_audio
    from smart_crawler_spark.operators.audio import (
        audio_fingerprint_dedup,
    )

    clips = generate_audio(spark, 100, vol_every=8)
    return audio_fingerprint_dedup(clips).orderBy("clip_id")


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-payload pipeline (third multimodal leg beside images and
    video): generate deterministic 16-bit PCM WAV clips distributed
    (datagen/audio.py — an INTEGER sawtooth, so every sample is exactly
    reproducible in SQL), decode each payload and extract windowed
    features (RMS, zero-crossing rate, peak, DC sum) in Arrow-batched
    mapInPandas (operators/audio.py, functions/wav.py). Unlike the
    image/video gates (generation-rule oracles), this oracle recomputes
    the FEATURE VALUES themselves in DuckDB from the closed-form sample
    generator — a full value-matching check of the decode + windowing +
    feature math. ``ok`` additionally pins the lossless PCM roundtrip
    (decoded sample sum == stored checksum)."""
    from smart_crawler_spark.datagen.audio import generate_audio
    from smart_crawler_spark.operators.audio import (
        audio_features as extract_features,
    )

    clips = generate_audio(spark, 100)
    return extract_features(clips, window=800).orderBy(
        "clip_id", "window_no"
    )


def supplier_region_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-chain broadcast joins (supplier ⋈ nation ⋈ region) +
    per-region stats with an arg-max top supplier — touches every
    remaining testdata table."""
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_acctbal"),
            F.max(F.struct("s_acctbal", "s_suppkey")).alias("m"),
        )
        .select(
            "r_name", "n_suppliers", "avg_acctbal",
            F.col("m.s_suppkey").alias("top_suppkey"),
            F.round("m.s_acctbal", 2).alias("top_acctbal"),
        )
        .orderBy("r_name")
    )


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (north_rule skew handling): partial
    agg on (key, salt) bounds any task's input, final agg merges the 32
    partials per key. Semantics identical to a plain groupBy — the oracle
    is the unsalted GROUP BY."""
    li = _t(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(32))
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.sum("l_quantity").alias("pq"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("pr"),
        F.count(F.lit(1)).alias("pn"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("pq"), 2).alias("sum_qty"),
            F.round(F.sum("pr"), 2).alias("sum_revenue"),
            F.sum("pn").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (TPC-H Q17): lineitems under 20% of
    their part's mean quantity. De-correlated as per-part avg agg +
    broadcast joins (part side is small after the brand filter)."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    li_b = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    thr = li_b.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("thr")
    )
    return (
        li_b.join(F.broadcast(thr), "l_partkey")
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q13_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count DISTRIBUTION through a
    FILTERED left outer join (the filter lives in the join condition,
    so no-order customers survive with count 0 — the shape a WHERE
    clause would silently break). Two-level aggregation: per-customer
    count, then histogram; both partial-aggregate map-side."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left"
    ).groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, size)
    EXCLUDING a supplier blocklist via left anti-join (the NOT IN
    de-correlation; null-safe by construction). The distinct agg is
    two-phase: dedup (brand, size, suppkey) partial-agg map-side,
    then count."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 3)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def brand_top_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 per group via max(struct(...)) aggregation — a map-side-
    combinable alternative to the window row_number pattern (no per-group
    sort, one shuffle of pre-aggregated partials; the right shape when
    K=1 and groups are many)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(F.max(F.struct("p_retailprice", "p_partkey")).alias("m"))
        .select(
            "p_brand",
            F.col("m.p_partkey").alias("top_partkey"),
            F.round("m.p_retailprice", 2).alias("top_price"),
        )
        .orderBy("p_brand")
    )


def rolling_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame aggregation: per-user rolling mean over the last 5
    events (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("roll_avg"),
    ).orderBy("user_id", "event_id")


def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per brand (linear interpolation —
    same definition as SQL quantile_cont)."""
    part = _t(spark, sf_dir, "part")
    pct = lambda p: F.round(  # noqa: E731
        F.percentile(F.col("p_retailprice"), F.lit(p)), 4
    )
    return (
        part.groupBy("p_brand")
        .agg(
            pct(0.25).alias("p25"),
            pct(0.5).alias("p50"),
            pct(0.75).alias("p75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("p_brand")
    )


def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregation (the batch analog of the
    Structured Streaming windowed agg in streaming/ingest.py; 1-hour
    windows align with date_trunc)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type",
            "n_events", "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL-style approximate percentiles (percentile_approx — the
    sketch path for 10^10-row quantiles, where exact percentile sorts
    every group). Same tolerance-oracle pattern as approx_distinct_hll:
    percentile_approx(accuracy=A) guarantees rank error <= n/A, so each
    approx value must lie between the exact interpolated quantiles at
    p ± 2/A; the output carries the exact median plus per-percentile
    ``ok`` booleans, the oracle states exact values and ok=true."""
    li = _t(spark, sf_dir, "lineitem")
    acc = 1000
    d = 2.0 / acc
    aggs = [
        F.percentile_approx("l_extendedprice", p, acc).alias(f"_a{i}")
        for i, p in enumerate((0.5, 0.9, 0.99))
    ] + [
        F.percentile("l_extendedprice", p).alias(f"_x{i}")
        for i, p in enumerate((0.5 - d, 0.5 + d, 0.9 - d, 0.9 + d,
                               0.99 - d, 0.99 + d))
    ]
    g = li.groupBy("l_returnflag").agg(*aggs)
    return g.select(
        "l_returnflag",
        F.round(F.col("_x0"), 4).alias("p50_lo"),
        (F.col("_a0").between(F.col("_x0"), F.col("_x1"))).alias("p50_ok"),
        (F.col("_a1").between(F.col("_x2"), F.col("_x3"))).alias("p90_ok"),
        (F.col("_a2").between(F.col("_x4"), F.col("_x5"))).alias("p99_ok"),
    ).orderBy("l_returnflag")


def interval_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join at scale (operators/relational.py
    range_join): each purchase event opens a ±5-minute attribution
    window; every click landing inside a window pairs with it. The
    operator bucketizes both sides onto fixed 300-s time bins and
    equi-joins on the bin — shuffle volume is rows × ~2, never the
    |clicks| × |purchases| cartesian a theta-join would plan."""
    from smart_crawler_spark.operators.relational import range_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("hi"),
    )
    out = range_join(clicks, purchases, "click_ts", "lo", "hi", bin_width_s=300)
    return out.select("click_id", "purchase_id").orderBy(
        "click_id", "purchase_id"
    )


def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (operators/relational.py
    stratified_sample): hash-threshold draw per o_orderstatus stratum.
    Map-side only — no shuffle, no RNG state — and the md5-derived
    uniform is engine-reproducible, so DuckDB selects the exact same
    rows (hash-exact oracle, unlike df.sample whose output depends on
    partition layout)."""
    from smart_crawler_spark.operators.relational import stratified_sample

    orders = _t(spark, sf_dir, "orders")
    out = stratified_sample(
        orders, "o_orderstatus", "o_orderkey",
        {"F": 0.25, "O": 0.10, "P": 0.50},
    )
    return out.select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).orderBy("o_orderkey")


def domain_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-distribution resampling (operators/relational.py
    domain_mix): rebalance the lang-skewed documents corpus (en is
    ~3x over-represented) to a 40/15/15/15/15 mix by downsampling on
    the shared md5 draw. The acceptance probabilities derive from one
    tiny lang-count agg + a broadcast join — the corpus sees a single
    map-side filter, so the plan is identical at 100 TB. Hash-exact
    oracle: DuckDB replays the same counts, cap and draw."""
    from smart_crawler_spark.operators.relational import domain_mix

    docs = _t(spark, sf_dir, "documents")
    out = domain_mix(
        docs, "lang", "doc_id",
        {"en": 0.40, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15},
    )
    return out.select("doc_id", "lang", "source", "n_chars").orderBy(
        "doc_id"
    )


def temperature_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain resampling (operators/relational.py
    temperature_mix; XLM-R/mT5 alpha-sampling, alpha = 0.5): the target
    shares derive from the corpus's own lang counts (n_d^0.5
    normalized), flattening the en-heavy skew toward uniform,
    downsampling-only on the shared md5 draw. Same single-map-filter
    plan as domain_mix; the oracle replays counts, powered-count
    normalizer, cap and draw with the identical expression order."""
    from smart_crawler_spark.operators.relational import temperature_mix

    docs = _t(spark, sf_dir, "documents")
    out = temperature_mix(docs, "lang", "doc_id", alpha=0.5)
    return out.select("doc_id", "lang", "source", "n_chars").orderBy(
        "doc_id"
    )


def shuffle_shard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment
    (operators/relational.py deterministic_shuffle): the reproducible
    global training order. The oracle states the spec directly — one
    row_number() over (md5 draw, doc_id) — while the engine computes
    the identical total order as a two-phase prefix sum (64 parallel
    bucket windows + a 64-row offset broadcast), never a corpus-sized
    single-partition sort. Hash-exact match proves the distributed
    order == the specification order."""
    from smart_crawler_spark.operators.relational import (
        deterministic_shuffle,
    )

    docs = _t(spark, sf_dir, "documents")
    out = deterministic_shuffle(docs, "doc_id", n_shards=8)
    return out.select("doc_id", "pos", "shard").orderBy("doc_id")


def dedup_keep_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection (operators/components.py
    keep_best): the same MinHash-LSH pair graph and connected
    components as dedup_keep, but each cluster keeps its
    HIGHEST-quality member (quality_score, ties -> lowest doc_id)
    instead of the min-id canonical — the decision rule a production
    dedup ships. Survivors come from one max_by agg on component
    (map-side partials, broadcast back); oracle replays components via
    recursive CTE + arg-max window on the identical rounded score."""
    from smart_crawler_spark.operators.components import (
        dedup_groups,
        keep_best,
    )
    from smart_crawler_spark.operators.textops import quality_score
    from smart_crawler_spark.operators import minhash

    docs = _doubled_docs(spark, sf_dir).filter(
        (F.col("doc_id") % 100000) < 1000
    )
    pairs = minhash.minhash_near_dup_pairs(
        docs, threshold=0.8, num_perm=64, bands=16
    )
    groups = dedup_groups(pairs, docs)
    scores = quality_score(docs).select("doc_id", "quality")
    return keep_best(groups, scores).orderBy("doc_id")


def caption_filter_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION/DataComp-style image+caption curation gate
    (operators/images.py caption_gate): minimum resolution from
    container HEADERS only (functions/headers.py — no pixel decode)
    plus a usable-caption predicate, one mapInPandas + Catalyst
    projection, no shuffle. The corpus plants a one-word 'thumb'
    caption every 5th row (short_caption_every=5); the oracle predicts
    dims from the generation rule and the caption decision from the
    plant rule."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import caption_gate

    corpus = generate_images(
        spark, 500, jpeg_every=10, short_caption_every=5
    )
    return caption_gate(corpus).orderBy("image_id")


def group_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling (operators/relational.py
    group_sample_k): exactly 2 orders per customer, chosen by the
    engine-reproducible md5 draw. The rank<=k filter plans as
    WindowGroupLimit (map-side partial limits — the shuffle carries
    ~k rows per group per task, not the group); the oracle is the
    same rank over the same draw in DuckDB."""
    from smart_crawler_spark.operators.relational import group_sample_k

    orders = _t(spark, sf_dir, "orders")
    out = group_sample_k(orders, "o_custkey", "o_orderkey", k=2)
    return out.select(
        "o_orderkey", "o_custkey", "o_totalprice", "rk"
    ).orderBy("o_orderkey")


def url_blocklist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain deny-list with subdomain semantics
    (frontier/canonical.py blocklist_filter): blocked domain d blocks
    host == d and *.d, but never the PARENT of a blocked subdomain.
    The synthesized hosts exercise all three cases (exact hit,
    subdomain hit, unlisted parent). Config-sized list -> the
    arrays_overlap literal path: zero joins, zero shuffles, pure
    codegen. Oracle states the rule as a correlated EXISTS over the
    same list."""
    from smart_crawler_spark.frontier.canonical import blocklist_filter

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    url = F.concat(
        F.lit("http://"),
        F.when(F.col("event_id") % 4 == 0, F.lit("ads.example"))
        .when(F.col("event_id") % 4 == 1, F.lit("a.b.ads.example"))
        .when(F.col("event_id") % 4 == 2, F.lit("example"))
        .otherwise(F.lit("ok.site")),
        F.lit(".test/p/"),
        F.col("event_id").cast("string"),
    )
    df = ev.select("event_id", url.alias("url"))
    out = blocklist_filter(
        df, ["ads.example.test", "bad.test", "spam.example.test"]
    )
    return out.select("event_id", "url", "blocked").orderBy("event_id")


def html_text_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk HTML -> text conversion (operators/textops.py
    extract_main_text): script/style/head/comment blocks dropped, tags
    stripped, entities decoded, whitespace collapsed — all Catalyst
    regexp chains, map-only. Documents are wrapped in a deterministic
    HTML shell (incl. entities and a comment) so the expected clean
    text is exactly recoverable; the oracle replays the identical
    regex chain in DuckDB."""
    from smart_crawler_spark.operators.textops import extract_main_text

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><style>p{color:red}</style></head><body>"
            "<script>var a = 1 &amp;&amp; 2;</script><p>"
        ),
        F.col("text"),
        F.lit("</p><!-- cmt --><div>footer &amp; nav</div></body></html>"),
    )
    wrapped = docs.select("doc_id", html.alias("html"))
    return extract_main_text(wrapped).orderBy("doc_id")


def streaming_image_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming image+caption ingestion (streaming/ingest.py
    start_image_ingest): availableNow micro-batches over a parquet
    image drop-box -> caption gate (header-only dims) -> per-content
    (md5-of-bytes) partial aggregates, one idempotent ledger partition
    per batch. The merged ledger (min image id + total copies per
    content) is provably arrival-order-independent, so the oracle can
    state the final dedup decision from the generator plant rules
    (dup_every=6 full-content copies, short_caption_every=5 one-word
    captions) without knowing the batch split."""
    import shutil
    import tempfile

    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.streaming.ingest import (
        read_image_ledger,
        start_image_ingest,
    )

    base = tempfile.mkdtemp(prefix="stream_img_")
    drop = f"{base}/dropbox"
    try:
        corpus = generate_images(
            spark, 240, jpeg_every=10, dup_every=6, short_caption_every=5
        )
        corpus.repartition(24).write.mode("overwrite").parquet(drop)
        stream = (
            spark.readStream.schema(corpus.schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(drop)
        )
        q = start_image_ingest(
            stream, ledger_dir=f"{base}/ledger",
            checkpoint_dir=f"{base}/ckpt",
        )
        q.awaitTermination()
        led = read_image_ledger(spark, f"{base}/ledger")
        out = led.orderBy("iid").select(
            F.concat(F.lit("img"), F.col("iid").cast("string")).alias(
                "image_id"
            ),
            "n_copies",
        )
        # materialize before the ledger files are removed
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def warc_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC archive ingestion (sources/warc.py warc_records over
    functions/warc.py): real ISO-28500 shards with per-record gzip
    members (the CommonCrawl layout) explode into per-fetch metadata
    rows — URL, type, status, payload length + md5 — one mapInPandas,
    no shuffle, shards parsed independently. The corpus is generated
    from a pure index rule (datagen/warc.py warc_record_rule), so the
    oracle states the parsed table over range() and a hash match
    proves the codec + reader roundtrip byte-exactly."""
    from smart_crawler_spark.datagen.warc import generate_warc_shards
    from smart_crawler_spark.sources.warc import warc_records

    shards = generate_warc_shards(spark, 40, 25)
    return (
        warc_records(shards)
        .select(
            "shard_id", "rec_idx", "url", "warc_type", "status",
            "n_bytes", "payload_md5",
        )
        .orderBy("shard_id", "rec_idx")
    )


def cdx_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture index (sources/warc.py cdx_index + the SURT sort
    key): per-record compressed-member coordinates with the
    random-access PROOF — each member re-decoded independently from
    its (offset, length) slice must reproduce the full-stream parse.
    Offsets themselves are gzip-implementation facts the oracle cannot
    state, so the gated columns are the index's logical content (surt,
    url, type, status) plus the slice_ok invariant; the byte
    coordinates are pinned by tests/test_warc.py instead."""
    from smart_crawler_spark.datagen.warc import generate_warc_shards
    from smart_crawler_spark.frontier.canonical import surt_key
    from smart_crawler_spark.sources.warc import cdx_index

    shards = generate_warc_shards(spark, 40, 25)
    return (
        cdx_index(shards)
        .select(
            surt_key(F.col("url")).alias("surt"),
            "shard_id",
            "rec_idx",
            "url",
            "warc_type",
            "status",
            "slice_ok",
        )
        .orderBy("surt", "shard_id", "rec_idx")
    )


def warc_revisit_resolve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC revisit-record resolution (sources/warc.py
    resolve_revisits): the CommonCrawl storage-dedup layout — every
    5th record whose block anchor is a 200 is stored as a payload-free
    `revisit` record carrying the anchor's payload digest
    (datagen/warc.py warc_revisit_rule) — resolved back to the
    deduplicated payload by ONE digest equi-join against the
    response-digest table (min-locator canonical original; only the
    rare revisit rows enter the join, the response bulk unions back
    map-side). Some revisits cross shard boundaries, so resolution is
    genuinely global. The oracle restates record + resolution rule
    arithmetically over range()."""
    from smart_crawler_spark.datagen.warc import generate_warc_shards
    from smart_crawler_spark.sources.warc import (
        resolve_revisits,
        warc_records,
    )

    shards = generate_warc_shards(spark, 40, 25, revisit_every=5)
    return (
        resolve_revisits(warc_records(shards))
        .select(
            "shard_id", "rec_idx", "url", "warc_type", "status",
            "resolved_md5", "resolved_bytes", "orig_shard_id",
            "orig_rec_idx", "resolved",
        )
        .orderBy("shard_id", "rec_idx")
    )


def surt_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT canonicalization (frontier/canonical.py surt_key): the
    CDX-index sort key — reversed host labels, port reattached, path +
    query, fragment dropped, case folded. Synthesized URLs cover
    subdomains, ports, root paths, queries and fragments; the oracle
    derives every SURT from the construction rule (never re-parsing),
    so a hash match proves the expression implements the transform."""
    from smart_crawler_spark.frontier.canonical import surt_key

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2500)
    host = F.concat(
        F.lit("H"),
        (F.col("user_id") % 5).cast("string"),
        F.when(F.col("event_id") % 3 == 0, F.lit(".sub")).otherwise(
            F.lit("")
        ),
        F.lit(".test"),
        F.when(F.col("event_id") % 2 == 0, F.lit(":8081")).otherwise(
            F.lit("")
        ),
    )
    url = F.concat(
        F.lit("http://"),
        host,
        F.when(F.col("event_id") % 11 == 0, F.lit("/")).otherwise(
            F.concat(F.lit("/p/"), F.col("event_id").cast("string"))
        ),
        F.when(
            F.col("event_id") % 7 == 0,
            F.concat(F.lit("?k="), (F.col("event_id") % 3).cast("string")),
        ).otherwise(F.lit("")),
        F.when(F.col("event_id") % 5 == 0, F.lit("#f")).otherwise(
            F.lit("")
        ),
    )
    df = ev.select("event_id", url.alias("url"))
    return df.select(
        "event_id", "url", surt_key(F.col("url")).alias("surt")
    ).orderBy("event_id")


def vocab_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction + token encoding (operators/textops.py
    vocab_encode): top-V words by frequency (ties lexicographic) get
    dense rank ids, documents encode positionally, OOV = -1. One
    word-count shuffle + a broadcast id map — the corpus never
    shuffles. The oracle replays counts, rank and the left join in
    SQL. V=25 < the corpus vocabulary, so OOV rows are exercised."""
    from smart_crawler_spark.operators.textops import vocab_encode

    docs = _t(spark, sf_dir, "documents")
    return vocab_encode(docs, vocab_size=25).orderBy("doc_id", "pos")


def _cust_supp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer→supplier trade pairs (via orders ⨝ lineitem);
    supplier ids offset by 1e6 into a disjoint node space."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 1000000).alias("s"),
        )
        .distinct()
    )


def label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (operators/
    graphops.py label_propagation; Raghavan et al. 2007 with min-label
    tie-break): 4 rounds over a planted block graph — 20-node chorded
    paths bridged every 100 ids — the site-family community signal.
    Oracle = the identical 4 rounds unrolled as chained CTEs with the
    same (count desc, label asc) argmax."""
    from smart_crawler_spark.operators.graphops import label_propagation

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(F.col("event_id").alias("i"))
    )
    e1 = ev.filter(F.col("i") % 20 != 19).select(
        F.col("i").alias("src"), (F.col("i") + 1).alias("dst")
    )
    e2 = ev.filter(F.col("i") % 20 < 18).select(
        F.col("i").alias("src"), (F.col("i") + 2).alias("dst")
    )
    e3 = ev.filter(
        (F.col("i") % 100 == 7) & (F.col("i") + 20 < 2000)
    ).select(F.col("i").alias("src"), (F.col("i") + 20).alias("dst"))
    edges = e1.unionAll(e2).unionAll(e3)
    return label_propagation(edges, iters=4).orderBy("node")


def pagerank_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank link-importance (operators/graphops.py): 8 power
    iterations over the bidirectional customer⇄supplier trade graph
    (every node has out-edges, so the dangling term is exactly 0 and
    the oracle can state the recurrence without it). Iterative
    co-partitioned joins, eager checkpoint every 2 rounds, dangling
    mass via a broadcast 1-row cross join (no per-iteration driver
    collect). Oracle = the same 8 iterations unrolled as chained CTEs
    in DuckDB. Output is rank × N (mean 1.0) rounded to 6dp."""
    from smart_crawler_spark.operators.graphops import pagerank

    pairs = _cust_supp_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    pr = pagerank(edges, iters=8, damping=0.85, checkpoint_interval=4)
    cnt = pr.agg(F.count("*").alias("_n"))
    return (
        pr.crossJoin(F.broadcast(cnt))
        .select(
            "node", F.round(F.col("pr") * F.col("_n"), 6).alias("pr_n")
        )
        .orderBy("node")
    )


def hits_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (operators/graphops.py): 6 L1-normalized
    iterations over the DIRECTED bipartite customer→supplier graph —
    customers are pure hubs, suppliers pure authorities, so both zero
    legs of the score vectors are exercised. Oracle = unrolled
    normalize-join CTE chain. Output scores × N rounded to 6dp."""
    from smart_crawler_spark.operators.graphops import hits

    pairs = _cust_supp_pairs(spark, sf_dir)
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    h = hits(edges, iters=6, checkpoint_interval=2)
    cnt = h.agg(F.count("*").alias("_n"))
    return (
        h.crossJoin(F.broadcast(cnt))
        .select(
            "node",
            F.round(F.col("hub") * F.col("_n"), 6).alias("hub_n"),
            F.round(F.col("auth") * F.col("_n"), 6).alias("auth_n"),
        )
        .orderBy("node")
    )


def triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient
    (operators/graphops.py:triangle_counts, Suri & Vassilvitskii 2011
    degree-ordered orientation) over the co-purchase graph: parts are
    nodes, an edge links two parts that appear in the same URGENT
    order. Orientation bounds every wedge source's out-degree at
    O(sqrt(m)), so the plan is three equi-joins + one aggregation with
    no quadratic hot-node blowup; the oracle enumerates the same
    triangles with the naive u<v<w triple join (affordable in DuckDB
    at gate scale)."""
    from smart_crawler_spark.operators.graphops import triangle_counts

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    lp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    edges = (
        a.join(b, "ok")
        .filter(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
    )
    return (
        triangle_counts(edges)
        .select(
            "node",
            "deg",
            F.col("tri").cast("long").alias("tri"),
            "lcc",
        )
        .orderBy("node")
    )


def anchor_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound anchor-text aggregation (graphops.py:anchor_text_agg):
    lineitem replays as a link log — src page on one of 50 hosts keyed
    by supplier, dst = the part's page, anchor drawn deterministically
    from quantity — and each target aggregates inlinks, anchor
    diversity, source-host diversity (link-farm discount), and the
    dominant anchor (count desc, anchor asc tie-break). The window
    runs over pre-aggregated (dst, anchor) rows only."""
    from smart_crawler_spark.operators.graphops import anchor_text_agg

    li = _t(spark, sf_dir, "lineitem")
    anchors = F.array(
        F.lit("buy now"),
        F.lit("details"),
        F.lit("best price"),
        F.lit("spec sheet"),
        F.lit("similar parts"),
    )
    links = li.select(
        F.concat(
            F.lit("http://h"),
            (F.col("l_suppkey") % 50).cast("string"),
            F.lit(".example/o/"),
            F.col("l_orderkey").cast("string"),
        ).alias("src"),
        F.concat(
            F.lit("http://site.example/part/"),
            F.col("l_partkey").cast("string"),
        ).alias("dst"),
        F.element_at(
            anchors, (F.col("l_quantity").cast("long") % 5 + 1).cast("int")
        ).alias("anchor"),
    )
    return (
        anchor_text_agg(links)
        .select(
            "dst",
            "inlinks",
            "distinct_anchors",
            "src_hosts",
            "top_anchor",
            "top_anchor_cnt",
        )
        .orderBy("dst")
    )


def neighborhood_function_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact neighborhood function N(h) (operators/graphops.py
    neighborhood_function — the effective-diameter curve of a link
    graph; the truth path whose register-sketch scale twin is
    hyperball_neighborhood, differentially pinned in
    tests/test_graphops.py): a deterministic 60-node digraph (ring +
    two chord families) built from the events id space, N(h) for
    h = 0..6. The oracle replays the graph and runs a recursive-CTE
    BFS to min pair distances — every count in the curve is checked,
    including the flat saturated tail."""
    from smart_crawler_spark.operators.graphops import neighborhood_function

    u = (
        _t(spark, sf_dir, "events")
        .select((F.col("event_id") % 60).alias("u"))
        .distinct()
    )
    ring = u.select("u", ((F.col("u") + 1) % 60).alias("v"))
    chord7 = u.filter(F.col("u") % 3 == 0).select(
        "u", ((F.col("u") * 7) % 60).alias("v")
    )
    chord13 = u.filter(F.col("u") % 5 == 0).select(
        "u", ((F.col("u") + 13) % 60).alias("v")
    )
    edges = ring.unionAll(chord7).unionAll(chord13).filter(
        F.col("u") != F.col("v")
    )
    return neighborhood_function(
        edges, max_hops=6, src="u", dst="v"
    ).orderBy("hop")


def effective_diameter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated 0.9-effective diameter (operators/graphops.py
    effective_diameter, ANF/KDD-2002 statistic) of the same
    deterministic 60-node graph as neighborhood_function — the oracle
    replays the recursive BFS curve AND the interpolation arithmetic,
    so the crossing-step selection and the 4dp rounding are both under
    the hash check."""
    from smart_crawler_spark.operators.graphops import (
        effective_diameter,
        neighborhood_function,
    )

    u = (
        _t(spark, sf_dir, "events")
        .select((F.col("event_id") % 60).alias("u"))
        .distinct()
    )
    ring = u.select("u", ((F.col("u") + 1) % 60).alias("v"))
    chord7 = u.filter(F.col("u") % 3 == 0).select(
        "u", ((F.col("u") * 7) % 60).alias("v")
    )
    chord13 = u.filter(F.col("u") % 5 == 0).select(
        "u", ((F.col("u") + 13) % 60).alias("v")
    )
    edges = ring.unionAll(chord7).unionAll(chord13).filter(
        F.col("u") != F.col("v")
    )
    nf = neighborhood_function(edges, max_hops=10, src="u", dst="v")
    return effective_diameter(nf, q=0.9)


def host_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level web-graph rollup (operators/graphops.py host_graph):
    the URL link table collapses to (src_host, dst_host) edges with
    link multiplicity, distinct-source-page support, and the
    internal/external flag — one two-level partial agg, shuffle volume
    = distinct host pairs. Low-quantity lineitems plant internal
    (same-host) edges so both flag values are exercised. Oracle
    replays the plant + rollup."""
    from smart_crawler_spark.operators.graphops import host_graph

    li = _t(spark, sf_dir, "lineitem")
    shost = F.concat(
        F.lit("h"), (F.col("l_suppkey") % 50).cast("string"),
        F.lit(".example"),
    )
    links = li.select(
        F.concat(
            F.lit("http://"), shost, F.lit("/o/"),
            F.col("l_orderkey").cast("string"),
        ).alias("src"),
        F.when(
            F.col("l_quantity") < 10,
            F.concat(
                F.lit("http://"), shost, F.lit("/p/"),
                F.col("l_partkey").cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://site"),
                (F.col("l_partkey") % 7).cast("string"),
                F.lit(".example/part/"),
                F.col("l_partkey").cast("string"),
            )
        )
        .alias("dst"),
    )
    return host_graph(links).orderBy("src_host", "dst_host")


def revisit_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-staleness recrawl scheduling (frontier/revisit.py,
    Cho & Garcia-Molina 2003): per-URL change rate from a visit log
    (change = content fingerprint differs from the previous visit),
    priority = 1 - exp(-lambda * age). Events replay as the visit log:
    one URL per user, fingerprint = floor(value/10), microsecond
    timestamps on both engines (unix_micros == epoch_us). One window +
    one aggregate, 'now' via broadcast 1-row cross join."""
    from smart_crawler_spark.frontier.revisit import revisit_priority

    v = _t(spark, sf_dir, "events").select(
        F.concat(
            F.lit("http://site.test/u/"), F.col("user_id").cast("string")
        ).alias("url"),
        # ts is TIMESTAMP_NTZ; session TZ is pinned UTC so the cast is
        # wall-clock identity and unix_micros == DuckDB epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") / 10.0).cast("long").alias("fp"),
        "event_id",
    )
    return revisit_priority(v, tiebreak="event_id").orderBy("url")


def crawl_site_prioritized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of the engine's PRIORITY-MODE pick
    (frontier/priority.py prioritized_pick — the production path
    EngineConfig.priority_mode runs in crawler/engine.py:_pick_batch,
    and the live form of the trustrank / revisit_priority side
    queries): a synthesized staleness-bearing frontier over 7 hosts is
    ranked per host by (staleness DESC, reference comparator) and
    capped at the trust-scaled budget max(1, floor(budget * trust)).
    Staleness uses the same staleness_expr the engine stamps
    re-enqueued recrawl rows with (Poisson changes/span rate, age to
    now=12). Covers the priority comparator, the WindowGroupLimit
    per-host pick, the broadcast trust join, and both clamps (trust 0
    -> min 1 slot; trust 1.2 capped by the base budget since
    rank <= budget filters first). The full multi-round engine loop is
    pinned against the sequential oracle in tests/test_priority_mode.py
    (iterative state — not SQL-expressible); this gate makes the pick
    kernel itself driver-checkable."""
    from smart_crawler_spark.frontier.priority import (
        prioritized_pick,
        staleness_expr,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 4000)
    eid = F.col("event_id")
    host = F.concat(
        F.lit("h"), (F.col("user_id") % 7).cast("string"), F.lit(".test")
    )
    span = eid % 5
    changes = eid % 3
    first = (eid % 2 + 1).cast("int")
    last = (first + span).cast("int")
    frontier = ev.select(
        F.concat(
            F.lit("http://"), host, F.lit("/p/"), eid.cast("string")
        ).alias("url"),
        host.alias("host"),
        (eid % 3).cast("int").alias("class_depth"),
        F.concat(F.lit("c"), (eid % 3).cast("string")).alias("class_name"),
        F.lit(None).cast("string").alias("form_params"),
        staleness_expr(changes, first, last, F.lit(12)).alias("staleness"),
    )
    trust = spark.createDataFrame(
        [(f"h{k}.test", k / 5.0) for k in range(7)],
        "host string, trust double",
    )
    return (
        prioritized_pick(frontier, budget=5, host_trust=trust)
        .select("host", "url", "rank", "staleness")
        .orderBy("host", "rank", "url")
    )


def sitemap_parse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (sources/sitemap.py): build one sitemap XML
    document per site from the part table — entries carry optional
    lastmod/priority, k%5 locs have an escaped '&', k%7 locs are CDATA
    (k%35: CDATA containing a RAW '&'), plus one sitemapindex doc —
    then parse them back with the pure-Catalyst fragment parser. The
    oracle states the generation rule directly, so entity decoding,
    CDATA handling and per-fragment field alignment are all under the
    hash check."""
    from smart_crawler_spark.sources.sitemap import parse_sitemaps

    k = F.col("k")
    base = F.concat(
        F.lit("http://s"),
        F.col("site").cast("string"),
        F.lit(".example/part/"),
        k.cast("string"),
    )
    loc_xml = (
        F.when(
            k % 35 == 0,
            F.concat(F.lit("<![CDATA["), base, F.lit("?a=1&b=2]]>")),
        )
        .when(k % 7 == 0, F.concat(F.lit("<![CDATA["), base, F.lit("]]>")))
        .when(k % 5 == 0, F.concat(base, F.lit("?a=1&amp;b=2")))
        .otherwise(base)
    )
    lastmod = F.when(
        k % 3 != 2,
        F.concat(
            F.lit("2024-01-"),
            F.lpad(((k % 28) + 1).cast("string"), 2, "0"),
        ),
    )
    changefreq = F.element_at(
        F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
        (k % 3 + 1).cast("int"),
    )
    priority = F.when(
        k % 4 == 0, F.concat(F.lit("0."), (k % 10).cast("string"))
    )
    entry = F.concat(
        F.lit("<url><loc>"),
        loc_xml,
        F.lit("</loc>"),
        F.coalesce(
            F.concat(F.lit("<lastmod>"), lastmod, F.lit("</lastmod>")),
            F.lit(""),
        ),
        F.lit("<changefreq>"),
        changefreq,
        F.lit("</changefreq>"),
        F.coalesce(
            F.concat(F.lit("<priority>"), priority, F.lit("</priority>")),
            F.lit(""),
        ),
        F.lit("</url>"),
    )
    parts = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), (F.col("p_partkey") % 37).alias("site")
    )
    site_docs = (
        parts.withColumn("_entry", entry)
        .groupBy("site")
        .agg(
            F.concat(
                F.lit(
                    '<?xml version="1.0"?><urlset '
                    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("k", "_entry"))
                        ),
                        lambda x: x["_entry"],
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )
    index_doc = (
        parts.select("site")
        .distinct()
        .agg(
            F.concat(
                F.lit("<sitemapindex>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("site")),
                        lambda s: F.concat(
                            F.lit("<sitemap><loc>http://idx.example/sm/"),
                            s.cast("string"),
                            F.lit(
                                ".xml</loc><lastmod>2024-02-01</lastmod>"
                                "</sitemap>"
                            ),
                        ),
                    ),
                    "",
                ),
                F.lit("</sitemapindex>"),
            ).alias("xml")
        )
        .select(F.lit(-1).cast("long").alias("site"), "xml")
    )
    docs = site_docs.unionByName(index_doc)
    return parse_sitemaps(docs, passthrough=["site"]).orderBy("kind", "loc")


def bpe_pair_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training kernel (operators/textops.py bpe_pair_stats):
    corpus-weighted adjacent-char-pair counts — word frequencies in one
    shuffle, pair explode over the DISTINCT word table only. The full
    sequential trainer (bpe_train/bpe_encode) is differential-tested
    against a pure-Python BPE in tests/test_bpe.py; this query puts the
    argmax table itself under the oracle hash."""
    from smart_crawler_spark.operators.textops import bpe_pair_stats

    docs = _t(spark, sf_dir, "documents")
    return bpe_pair_stats(docs, top_k=50).orderBy(
        F.col("weight").desc(), F.col("pair").asc()
    )


def encoding_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health gate (operators/textops.py encoding_quality):
    U+FFFD / control-char / mojibake counts + keep flag, map-only
    Catalyst regexp_count. The synthetic corpus is clean text, so the
    query plants deterministic damage the way _doubled_docs plants
    dups: doc_id%5==0 rows get every 'e' mojibaked to 'Ã©',
    doc_id%7==0 rows get a BEL control char appended, doc_id%11==0 rows
    get a replacement char — the oracle applies the identical
    replace()/concat transforms, so every count column is value-checked,
    not just the keep bit."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t = F.col("text")
    t = F.when(F.col("doc_id") % 5 == 0, F.regexp_replace(t, "e", "Ã©")).otherwise(t)
    t = F.when(F.col("doc_id") % 7 == 0, F.concat(t, F.lit("\x07"))).otherwise(t)
    t = F.when(F.col("doc_id") % 11 == 0, F.concat(t, F.lit("�"))).otherwise(t)
    corrupted = d.select("doc_id", t.alias("text"))
    return textops.encoding_quality(corrupted).orderBy("doc_id")


def char_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution entropy (operators/textops.py
    char_entropy): the corpus-independent gibberish signal — ln(N) -
    sum(c ln c)/N over charlm-normalized character counts, computed
    entirely with Catalyst higher-order functions (map-only, zero
    shuffles). The oracle recomputes the same entropy from a
    generate_series char explode in SQL; both sides round to 6 dp."""
    docs = _t(spark, sf_dir, "documents")
    return textops.char_entropy(docs).orderBy("doc_id")


def truncation_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-containment dedup (operators/textops.py truncation_pairs):
    (short, long) pairs where the short doc's normalized text is a
    strict prefix of the long doc's — truncated scrapes. Planted: every
    doc_id%4==0 document gets a 150-raw-char truncated twin at
    id+300000. Candidates from an equi-join on md5 of the first 64
    normalized chars (hot keys capped at 50 docs), verified by one
    substring equality — no cartesian (pinned in tests/test_plans.py)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.substring("text", 1, 150).alias("text"),
    )
    return textops.truncation_pairs(d.unionByName(planted)).orderBy(
        "id_short", "id_long"
    )


def group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: assign splits by near-dup
    COMPONENT, not by document, so no near-duplicate pair ever straddles
    train and test (per-doc hashing leaks ~half of every dup pair's
    content into eval). Components come from the same MinHash-LSH +
    connected-components path as near_dup_components; the split is the
    md5-threshold draw on the component label (8/1/1 train/val/test) —
    deterministic, layout-independent, and exactly replayable in SQL
    (same recursive-CTE components + the md5_hash32 rule)."""
    comp = near_dup_components(spark, sf_dir)
    b = textops.md5_hash32(F.col("component")) % 10
    return comp.select(
        "doc_id",
        "component",
        F.when(b < 8, F.lit("train"))
        .when(b == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).orderBy("doc_id")


def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (operators/simsearch.py
    hard_negative_topk): per query, the 3 most similar corpus vectors
    with cosine BELOW the 0.95 dedup threshold. The corpus carries the
    standard planted near-dups (w_i = v_i + 0.18 v_{i+1}, cos ~0.98), so
    the gate proves the dup cut actually excludes them from the rank
    slots — the miner must return the hardest NON-duplicate neighbors,
    which is exactly the false-negative poisoning case in contrastive
    training."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = emb.unionByName(_planted_query_vecs(spark, sf_dir, n=None))
    queries_df = emb.filter(F.col("vec_id") < 5)
    return simsearch.hard_negative_topk(
        queries_df, corpus, k=3, dup_threshold=0.95
    ).orderBy("query_id", "rank")


def redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop redirect resolution (operators/graphops.py
    resolve_redirect_chains): pointer jumping collapses chains in
    O(log L) co-partitioned self-joins instead of an L-round walk — the
    canonicalize-before-seen-probe step a 10^10-URL frontier needs when
    hops are separate fetch records. The synthetic map chains
    consecutive event urls (broken every 13th, so chains run 1..13
    hops) and plants a 3-cycle plus a lead-in tail; cycles resolve to
    (NULL, -1, is_cycle=true) — detection-order-free, so the oracle's
    bounded recursive walk states the identical rows."""
    from smart_crawler_spark.operators.graphops import (
        resolve_redirect_chains,
    )

    ids = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .select("event_id")
        .distinct()
    )
    u = lambda c: F.concat(F.lit("http://site.test/p"), c.cast("string"))  # noqa: E731
    chain = ids.filter(F.col("event_id") % 13 != 12).select(
        u(F.col("event_id")).alias("src"),
        u(F.col("event_id") + 1).alias("dst"),
    )
    planted = spark.createDataFrame(
        [(90000, 90001), (90001, 90002), (90002, 90003), (90003, 90001)],
        "x long, y long",
    ).select(u(F.col("x")).alias("src"), u(F.col("y")).alias("dst"))
    return resolve_redirect_chains(
        chain.unionByName(planted), max_chain=64
    ).orderBy("url")


def kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition at k=3 (operators/graphops.py kcore) over
    the bidirectional customer⇄supplier trade graph — the density
    filter that separates hub participants from leaf nodes whose every
    edge dies with its neighbors. 8 FIXED peel rounds (fixpoint rounds
    are no-ops), bit-identical to the oracle's 8 statically unrolled
    peel CTEs; each round is one degree agg + two semi-joins on the
    shrinking edge set."""
    from smart_crawler_spark.operators.graphops import kcore

    pairs = _cust_supp_pairs(spark, sf_dir)
    return kcore(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")),
        k=3,
        rounds=8,
    ).orderBy("node")


def trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank / personalized PageRank (operators/graphops.py
    personalized_pagerank): teleport restricted to a trusted seed set
    (customer nodes divisible by 97), 8 iterations over the
    bidirectional trade graph (dangling term identically 0, so the
    oracle's unrolled recurrence omits it, same as pagerank). Rank mass
    measures proximity to trust — the spam-demoting frontier priority.
    Output is rank x N (same convention as pagerank) rounded 6 dp."""
    from smart_crawler_spark.operators.graphops import (
        personalized_pagerank,
    )

    pairs = _cust_supp_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    seeds = (
        pairs.select(F.col("c").alias("node"))
        .distinct()
        .filter(F.col("node") % 97 == 0)
    )
    pr = personalized_pagerank(
        edges, seeds, iters=8, damping=0.85, checkpoint_interval=4
    )
    cnt = pr.agg(F.count("*").alias("_n"))
    return (
        pr.crossJoin(F.broadcast(cnt))
        .select("node", F.round(F.col("pr") * F.col("_n"), 6).alias("tr_n"))
        .orderBy("node")
    )


def html_tag_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural HTML triage stats (operators/textops.py
    html_tag_stats): tag/link/script/img counts + text-to-markup ratio,
    map-only regexp arithmetic. Documents are wrapped in a
    deterministic shell whose link and image counts VARY with doc_id
    (doc_id%3 anchors, doc_id%2 images) so the count columns are
    non-constant; the oracle builds the identical shell with repeat()."""
    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            '<html><head><title>d</title><script src="a.js"></script>'
            "</head><body><p>"
        ),
        F.col("text"),
        F.lit("</p>"),
        F.repeat(F.lit('<a href="/x">l</a>'), (F.col("doc_id") % 3).cast("int")),
        F.repeat(F.lit('<img src="/i.png">'), (F.col("doc_id") % 2).cast("int")),
        F.lit("</body></html>"),
    )
    wrapped = docs.select("doc_id", html.alias("html"))
    return textops.html_tag_stats(wrapped).orderBy("doc_id")


def truncated_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-ablation audit (operators/simsearch.py
    truncated_recall_audit): exact top-5 under the full 64-dim vectors
    vs the 16-dim prefix, per-query overlap + recall@5 — the
    index-sizing probe that pairs with quantize_embeddings (precision
    axis) on the storage-cost ladder. Both rankings share cosine_topk's
    rounded tie-break, so the oracle replays both sets exactly (the
    truncated ranking is the same dots CTE filtered to i <= 16)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return simsearch.truncated_recall_audit(
        queries_df, emb, dims=16, k=5
    ).orderBy("query_id")


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width corpus profile (operators/relational.py
    numeric_histogram): the document word-count distribution in
    20-word bins — one map-side bin assignment + a bin-bounded
    aggregation; the ANALYZE-style stats pass a 100 TB curation run
    starts with."""
    from smart_crawler_spark.operators.relational import numeric_histogram

    docs = _t(spark, sf_dir, "documents")
    nw = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    )
    return numeric_histogram(
        docs.select(nw.alias("n_words")), "n_words", bin_width=20.0
    ).orderBy("bin_id")


def corpus_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card row (operators/textops.py corpus_summary): doc
    count, total words, mean quality, per-language counts in one fused
    scan + one global agg. Per-document quality rounds to 6 dp BEFORE
    the average (both engines), so the card is hash-stable despite
    aggregation-order ulps."""
    docs = _t(spark, sf_dir, "documents")
    return textops.corpus_summary(docs)


def tfidf_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical all-pairs tf-idf cosine (operators/textops.py
    tfidf_cosine_pairs, Bayardo et al. WWW'07 shape): inverted-index
    self-join with a df cap, idf = ln(N/df) exact. The doubled corpus
    plants exact-dup pairs (cosine 1.0); the 0.5 threshold keeps them
    plus genuinely overlapping vocabulary. Third similarity family
    next to shingle sketches and embeddings — rare-vocabulary overlap."""
    docs = _doubled_docs(spark, sf_dir).filter(
        (F.col("doc_id") % 100000) < 300
    )
    return textops.tfidf_cosine_pairs(
        docs, threshold=0.5, max_df=100
    ).orderBy("id_a", "id_b")


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase within 7 days of the
    first view (operators/relational.py funnel_counts): earliest-
    completion semantics, one user-keyed agg per step joined to the
    previous step's per-user frontier — k shuffles on the user key,
    never a raw-stream self-join. The oracle states the same three
    chained min-after aggregations."""
    from smart_crawler_spark.operators.relational import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(
        ev, ["view", "click", "purchase"], within_s=7 * 24 * 3600
    ).orderBy("step")


def retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts (operators/relational.py retention_cohorts):
    cohort = first-event day per user, retained at offset k if active
    exactly k days later; output is calendar-bounded (cohorts x
    offsets), the activation/decay matrix. One min-agg + one broadcast
    join + one distinct count."""
    from smart_crawler_spark.operators.relational import retention_cohorts

    ev = _t(spark, sf_dir, "events")
    # cohort_day as an ISO string: the gate stringifies cells, and
    # pandas renders a DuckDB DATE as midnight-timestamp text
    return (
        retention_cohorts(ev)
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
        .orderBy("cohort_day", "day_offset")
    )


def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / CDC-apply parity (operators/relational.py
    merge_upsert): fold a deterministic changeset (deletes on key%7==0,
    updates on ==1, inserts on ==2, plus two planted NO-OP rows — an
    'I' on a matched key and a 'D' on a missing key, which SQL MERGE
    ignores) into the orders table via one full-outer join. The
    storage-maintenance trio is now diff (snapshot_diff), apply (this),
    and history (scd2_history)."""
    from smart_crawler_spark.operators.relational import merge_upsert

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    k = F.col("key")
    nulls = [
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("double").alias("price"),
    ]
    changes = (
        o.filter(k % 7 == 0).select("key", F.lit("D").alias("op"), *nulls)
        .unionByName(
            o.filter(k % 7 == 1).select(
                "key",
                F.lit("U").alias("op"),
                F.lit("X").alias("status"),
                F.round(F.col("price") + 100.0, 2).alias("price"),
            )
        )
        .unionByName(
            o.filter(k % 7 == 2).select(
                (k + 10000000).alias("key"),
                F.lit("I").alias("op"),
                F.lit("N").alias("status"),
                F.round(F.col("price") * 2.0, 2).alias("price"),
            )
        )
        .unionByName(
            o.filter(k % 7 == 3).select(
                "key",
                F.lit("I").alias("op"),
                F.lit("Z").alias("status"),
                F.lit(0.0).alias("price"),
            )
        )
        .unionByName(
            o.filter(k % 7 == 4).select(
                (k + 20000000).alias("key"), F.lit("D").alias("op"), *nulls
            )
        )
    )
    return merge_upsert(o, changes, key_col="key").orderBy("key")


def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day (operators/relational.py
    rolling_distinct): the rolling metric a window function can't
    produce (distincts don't sum), solved by a bounded explode — each
    deduped (user, active-day) pair contributes to <= 7 window-end days
    — and one count_distinct per day. Complements rolling_avg_events
    (summable) on the sliding-window family."""
    from smart_crawler_spark.operators.relational import rolling_distinct

    ev = _t(spark, sf_dir, "events")
    return (
        rolling_distinct(ev, window_days=7)
        .select(F.col("day").cast("string").alias("day"), "n_distinct_users")
        .orderBy("day")
    )


def cross_format_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-format dedup invariant (operators/images.py
    cross_format_phash_check): every PNG in the deterministic corpus,
    re-encoded as baseline JPEG at quality 90 and decoded back, stays
    within 12 phash bits of the original (measured: max hamming 2 on
    this corpus) — the property that lets phash-LSH dedup a PNG upload
    against its JPEG mirror when byte hashes see two different files.
    Map-only Arrow decode/encode/decode; oracle predicts the invariant
    from the generation rule like image_decode_verify."""
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import (
        cross_format_phash_check,
    )

    corpus = generate_images(spark, 500, jpeg_every=10)
    return (
        cross_format_phash_check(corpus, quality=90, max_hamming=12)
        .select("image_id", "within")
        .orderBy("image_id")
    )


def fuzzy_join_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join (operators/fuzzy.py fuzzy_self_join):
    FastSS deletion-neighborhood blocking + exact JVM levenshtein
    verify — no cartesian product, the explode ships (id, hash) rows
    only. Corpus: unique composed keys p_name#p_partkey plus planted
    single-character deletions (every 5th base key, deterministic
    position), so ground truth is SQL-replayable with DuckDB's own
    levenshtein under the sound |len(a)-len(b)|<=1 prefilter."""
    from smart_crawler_spark.operators.fuzzy import fuzzy_self_join

    base = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 4 == 0)
        .select(
            F.col("p_partkey").alias("id"),
            F.concat(
                F.col("p_name"),
                F.lit("#"),
                F.col("p_partkey").cast("string"),
            ).alias("key"),
        )
    )
    k, pos = F.col("key"), (F.col("id") % 5) + 1
    typos = base.filter(F.col("id") % 20 == 0).select(
        (F.col("id") + 10000000).alias("id"),
        F.concat(
            k.substr(F.lit(1), pos - 1), k.substr(pos + 1, F.length(k))
        ).alias("key"),
    )
    return (
        fuzzy_self_join(base.unionByName(typos), "key", "id", max_dist=1)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
        .orderBy("id_a", "id_b")
    )


def pmi_collocations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram PMI collocation mining (operators/textops.py
    pmi_collocations): the phrase-detection pass a curation pipeline
    runs before vocabulary induction. Two counting groupBys, broadcast
    unigram joins, 1-row totals; PMI arithmetic arranged as
    (c_xy*N*N)/(B*c_x*c_y) so DuckDB replays it bit-for-bit."""
    from smart_crawler_spark.operators.textops import pmi_collocations

    docs = _t(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=5).orderBy("w1", "w2")


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval reciprocal-rank fusion (operators/textops.py
    rrf_fuse): BM25 lexical list (bm25_topk, terms spark/window/merge,
    k=100) fused with a vector list (simsearch.cosine_topk from
    query vec_id=0, k=100) by sum of 1/(60+rank) — the calibration-free
    hybrid-search composition. Fusion itself is k-bounded: one
    full-outer join of two <=100-row lists + a topn-row window."""
    from smart_crawler_spark.operators.textops import bm25_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["spark", "window", "merge"], k=100)
    vec = simsearch.cosine_topk(
        emb.filter(F.col("vec_id") == 0), emb, k=100
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse(lex, vec, id_col="doc_id", k_const=60, topn=20)


def _quality_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, quality, y) — the heuristic quality score ranking the
    is-English label; shared input of quality_auc / score_calibration."""
    from smart_crawler_spark.operators.textops import quality_score

    docs = _t(spark, sf_dir, "documents")
    return quality_score(docs).select("doc_id", "quality").join(
        docs.select("doc_id", (F.col("lang") == "en").alias("y")),
        "doc_id",
    )


def zipf_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law corpus fingerprint (operators/textops.py zipf_fit):
    ln-freq ~ ln-rank least squares over the top-1000 words plus exact
    vocab/token counts — the drift detector a per-ingest-batch audit
    runs next to corpus_summary. One word-count groupBy, top-n via
    TakeOrdered, regression sums over the bounded 1000-row frame."""
    from smart_crawler_spark.operators.textops import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), top_n=1000)


def gate_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (operators/evalmetrics.py cohens_kappa) between
    the quality gate (heuristic quality >= 0.77, the corpus median) and
    the is-English label — the bias audit asking whether the quality
    threshold is secretly a language filter. One map-side projection +
    one 1-row contingency aggregate, integer arithmetic to the end."""
    from smart_crawler_spark.operators.evalmetrics import cohens_kappa

    ql = _quality_labels(spark, sf_dir)
    return cohens_kappa(
        ql.select((F.col("quality") >= 0.77).alias("a"), F.col("y").alias("b"))
    )


def bm25_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 ranking (operators/evalmetrics.py
    ndcg_at_k): graded relevance = total occurrences of the query
    terms in the doc, so the metric asks "does BM25 put term-dense
    docs first" — the IR-eval closer pairing with quality_auc
    (classification) and score_calibration (reliability). DCG joins
    labels onto the 10-row list; IDCG is one TakeOrdered top-k over
    the label table."""
    from smart_crawler_spark.operators.evalmetrics import ndcg_at_k
    from smart_crawler_spark.operators.textops import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    terms = ["spark", "window", "merge"]
    ranked = bm25_topk(docs, terms, k=10)
    rels = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("term"),
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        # grade capped at 16: keeps 2^rel finite whatever the corpus
        .agg(F.least(F.count(F.lit(1)), F.lit(16)).alias("rel"))
    )
    return ndcg_at_k(ranked, rels, k=10, id_col="doc_id", rel_col="rel")


def quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC (operators/evalmetrics.py roc_auc) of
    the heuristic quality score discriminating English documents — the
    threshold audit for a classifier-driven curation gate. Mann-Whitney
    rank-sum WITHOUT a global corpus sort: distinct-score aggregation +
    the sequence_pack-style two-phase prefix sum; integer numerator so
    the value is float-order-stable."""
    from smart_crawler_spark.operators.evalmetrics import roc_auc

    return roc_auc(_quality_labels(spark, sf_dir), "quality", "y")


def score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table (operators/evalmetrics.py calibration_bins):
    10 equal-width bins over the quality score vs the is-English rate —
    per-bin confidence, accuracy, and |gap| (the ECE ingredients). One
    map-side bin assignment + one 10-row groupBy; per-bin mean score
    reconstructed from an integer micro-unit sum."""
    from smart_crawler_spark.operators.evalmetrics import calibration_bins

    return calibration_bins(
        _quality_labels(spark, sf_dir), "quality", "y", n_bins=10
    )


# --------------------------------------------------------------------------
# contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "frontier_dedup": frontier_dedup,
        "per_host_topk": per_host_topk,
        "url_canonicalize": url_canonicalize,
        "idn_hosts": idn_hosts_q,
        "url_trap_detect": url_trap_detect,
        "url_templates": url_templates_q,
        "mirror_detect": mirror_detect,
        "template_cap": template_cap_q,
        "host_profile": host_profile_q,
        "snapshot_diff": snapshot_diff_q,
        "weighted_sample": weighted_sample_q,
        "quantize_embeddings": quantize_embeddings_q,
        "quantized_topk": quantized_topk_q,
        "scd2_history": scd2_history_q,
        "regex_join_eval": regex_join_eval,
        "schema_groupby": schema_groupby,
        "exact_dedup": exact_dedup,
        "unicode_dedup": unicode_dedup_q,
        "phrase_search": phrase_search_q,
        "jaccard_near_dup": jaccard_near_dup,
        "token_stats": token_stats,
        "language_id": language_id,
        "quality_score": quality_score,
        "doc_fingerprint": doc_fingerprint,
        "embedding_topk": embedding_topk,
        "embedding_near_dup": embedding_near_dup,
        "sessionize": sessionize,
        "word_set_ops": word_set_ops,
        "rollup_revenue": rollup_revenue,
        "q5_region_revenue": q5_region_revenue,
        "asof_latest_event": asof_latest_event,
        "distinct_counts": distinct_counts,
        "event_pivot": event_pivot,
        "minhash_near_dup": minhash_near_dup,
        "incremental_near_dup": incremental_near_dup_q,
        "near_dup_components": near_dup_components,
        "near_dup_components_star": near_dup_components_star,
        "simhash_near_dup": simhash_near_dup,
        "lsh_embedding_topk": lsh_embedding_topk,
        "ivf_embedding_topk": ivf_embedding_topk,
        "pq_embedding_topk": pq_embedding_topk,
        "ivfpq_embedding_topk": ivfpq_embedding_topk,
        "q4_priority_semijoin": q4_priority_semijoin,
        "table_set_ops": table_set_ops,
        "outlink_classify": outlink_classify,
        "xpath_idf": xpath_idf,
        "cluster_metrics": cluster_metrics,
        "bfs_depths": bfs_depths_q,
        "phash_near_dup": phash_near_dup,
        "streaming_ingest_dedup": streaming_ingest_dedup,
        "streaming_host_rate": streaming_host_rate,
        "streaming_late_drop": streaming_late_drop,
        "streaming_session_window": streaming_session_window,
        "streaming_fetch_join": streaming_fetch_join,
        "streaming_fetch_timeout": streaming_fetch_timeout,
        "streaming_dedup_ttl": streaming_dedup_ttl,
        "streaming_static_enrich": streaming_static_enrich,
        "approx_distinct_hll": approx_distinct_hll,
        "robots_filter": robots_filter,
        "image_decode_verify": image_decode_verify,
        "image_patch_verify": image_patch_verify_q,
        "watermark_detect": watermark_detect_q,
        "watermark_detect_perceptual": watermark_detect_perceptual_q,
        "image_augment_verify": image_augment_verify_q,
        "video_frame_sample": video_frame_sample,
        "video_frame_sample_mjpeg": video_frame_sample_mjpeg,
        "video_scene_cuts": video_scene_cuts_q,
        "image_metadata_audit": image_metadata_audit_q,
        "image_metadata_strip": image_metadata_strip_q,
        "audio_features": audio_features,
        "audio_near_dup": audio_near_dup_q,
        "supplier_region_stats": supplier_region_stats,
        "skew_salted_agg": skew_salted_agg,
        "q17_small_quantity": q17_small_quantity,
        "q13_cust_order_dist": q13_cust_order_dist,
        "q16_supplier_cnt": q16_supplier_cnt,
        "cube_order_counts": cube_order_counts,
        "brand_top_part": brand_top_part,
        "rolling_avg_events": rolling_avg_events,
        "ntile_quartiles": ntile_quartiles,
        "price_percentiles": price_percentiles,
        "hourly_event_windows": hourly_event_windows,
        "interval_range_join": interval_range_join,
        "stratified_sample": stratified_sample_orders,
        "repetition_stats": repetition_stats,
        "approx_quantiles": approx_quantiles,
        "sequence_pack": sequence_pack,
        "decontaminate": decontaminate,
        "image_aspect_bucket": image_aspect_bucket,
        "image_quality_filter": image_quality_filter,
        "image_bomb_guard": image_bomb_guard,
        "image_exact_dedup": image_exact_dedup,
        "image_decontaminate": image_decontaminate,
        "image_pyramid": image_pyramid_q,
        "webdataset_roundtrip": webdataset_roundtrip_q,
        "caption_boilerplate": caption_boilerplate_q,
        "image_ingest_dedup": image_ingest_dedup_q,
        "pii_redact": pii_redact_docs,
        "line_dedup": line_dedup_docs,
        "bm25_topk": bm25_topk_docs,
        "fielded_bm25": fielded_bm25_q,
        "pca_project": pca_project_verify,
        "charlm_perplexity": charlm_ppl_docs,
        "shard_pack": shard_pack_docs,
        "image_caption_joint_dedup": image_caption_joint_dedup,
        "substring_dup": substring_dup_docs,
        "substring_dup_verify": substring_dup_verify_q,
        "dup_passage_scrub": dup_passage_scrub_q,
        "dsir_weight": dsir_weight_docs,
        "semantic_dedup": semantic_dedup_q,
        "dedup_keep": dedup_keep_docs,
        "ccnet_bucket": ccnet_bucket_docs,
        "image_resize_verify": image_resize_verify,
        "heavy_hitters": heavy_hitters_q,
        "quality_gate": quality_gate_docs,
        "fasttext_quality": fasttext_quality_docs,
        "cms_freq_est": cms_freq_est_docs,
        "chunk_split": chunk_split_docs,
        "zorder_layout": zorder_layout_events,
        "compaction_plan": compaction_plan_q,
        "crawl_budget_alloc": crawl_budget_alloc_q,
        "jpeg_quality_est": jpeg_quality_q,
        "domain_mix": domain_mix_docs,
        "temperature_mix": temperature_mix_docs,
        "clip_align_filter": clip_align_filter_q,
        "embedding_outliers": embedding_outliers_q,
        "shuffle_shard": shuffle_shard_docs,
        "dedup_keep_best": dedup_keep_best_docs,
        "caption_filter": caption_filter_images,
        "group_sample": group_sample_orders,
        "url_blocklist": url_blocklist_q,
        "html_text_extract": html_text_extract_docs,
        "streaming_image_ingest": streaming_image_ingest,
        "warc_source": warc_source_q,
        "cdx_index": cdx_index_q,
        "warc_revisit_resolve": warc_revisit_resolve_q,
        "surt_index": surt_index_q,
        "vocab_encode": vocab_encode_docs,
        "pagerank": pagerank_graph,
        "neighborhood_function": neighborhood_function_q,
        "effective_diameter": effective_diameter_q,
        "label_propagation": label_propagation_q,
        "host_graph": host_graph_q,
        "triangle_count": triangle_count_q,
        "anchor_text": anchor_text_q,
        "hits": hits_graph,
        "revisit_priority": revisit_priority_q,
        "crawl_site_prioritized": crawl_site_prioritized_q,
        "sitemap_parse": sitemap_parse_q,
        "bpe_pair_stats": bpe_pair_stats_docs,
        "encoding_quality": encoding_quality_q,
        "char_entropy": char_entropy_q,
        "truncation_pairs": truncation_pairs_q,
        "group_split": group_split,
        "hard_negatives": hard_negatives,
        "redirect_chains": redirect_chains,
        "kcore": kcore_trade_graph,
        "trustrank": trustrank,
        "html_tag_stats": html_tag_stats_q,
        "truncated_recall": truncated_recall,
        "length_histogram": length_histogram,
        "corpus_summary": corpus_summary_q,
        "tfidf_cosine": tfidf_cosine_q,
        "event_funnel": event_funnel,
        "retention_cohorts": retention_cohorts_q,
        "merge_upsert": merge_upsert_q,
        "rolling_distinct_users": rolling_distinct_users,
        "cross_format_phash": cross_format_phash,
        "fuzzy_join_keys": fuzzy_join_keys,
        "pmi_collocations": pmi_collocations_q,
        "rrf_fusion": rrf_fusion,
        "quality_auc": quality_auc,
        "score_calibration": score_calibration,
        "bm25_ndcg": bm25_ndcg,
        "gate_agreement_kappa": gate_agreement_kappa,
        "zipf_fit": zipf_fit_q,
    }


# the trap-feature CTE chain shared by the url_trap_detect and
# host_profile oracles (continues the WITH list opened by
# _TRAP_URLS_SQL; h carries per-URL features + host + path)
_TRAP_FEATURES_SQL = """,
            f AS (
                SELECT event_id, url, host,
                       regexp_replace(regexp_replace(url,
                           '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                           '[?#].*$', '') AS path,
                       coalesce(regexp_extract(url, '^[^#?]*\\?([^#]*)', 1), '')
                           AS query
                FROM u
            ),
            g AS (
                SELECT event_id, url, host, path, query,
                       list_filter(string_split(path, '/'), s -> s <> '')
                           AS segs
                FROM f
            ),
            h AS (
                SELECT event_id, url, host, path,
                       len(segs) AS depth,
                       CASE WHEN len(segs) > 0
                            THEN round(1.0 - CAST(len(list_distinct(segs))
                                 AS DOUBLE) / len(segs), 6)
                            ELSE 0.0 END AS repeat_frac,
                       CASE WHEN query = '' THEN 0
                            ELSE len(string_split(query, '&')) END AS n_params,
                       regexp_matches(lower(query),
                           '(^|&)(phpsessid|jsessionid|sessionid|sid)=')
                           AS has_session,
                       regexp_matches(path,
                           '/((1[0-8][0-9]{2})|(19[0-8][0-9])|(20[4-9][0-9])|(2[1-9][0-9]{2}))(/|$)')
                           AS calendar_trap
                FROM g
            )"""


# _trap_url_population replayed in SQL (url_trap_detect / url_templates)
_TRAP_URLS_SQL = """
        u AS (
            SELECT event_id,
                   lower('h' || (user_id % 5) || '.test') AS host,
                   'http://h' || (user_id % 5) || '.test' ||
                   CASE WHEN event_id % 13 = 0 THEN '/a/b/a/b/a/b'
                        WHEN event_id % 11 = 0
                        THEN '/cal/' || (event_id % 70 + 1980) || '/'
                             || (event_id % 12 + 1)
                        WHEN event_id % 7 = 0
                        THEN '/d/e/f/g/h/i/j/k/' || event_id
                        ELSE '/p/' || (event_id % 50) || '/item/' || event_id
                   END ||
                   CASE WHEN event_id % 17 = 0
                        THEN '?phpsessid=s' || event_id
                        WHEN event_id % 19 = 0
                        THEN '?a=1&b=2&c=3&d=4&e=5&f=6'
                        WHEN event_id % 3 = 0 THEN '?page=' || (event_id % 4)
                        ELSE '' END AS url
            FROM events WHERE event_id < 4000
        )"""


_TRADE_GRAPH_SQL = """
        pairs AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS s
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )"""


def _lpa_oracle_sql(iters: int = 4) -> str:
    """Synchronous label propagation unrolled as chained CTEs — per
    round a neighbor-label count and the (count desc, label asc)
    argmax, with the node-universe left join + own-id coalesce exactly
    as the operator's update."""
    parts = [
        """
        WITH base AS (SELECT event_id AS i FROM events
                      WHERE event_id < 2000),
        ed AS MATERIALIZED (
            SELECT i AS src, i + 1 AS dst FROM base WHERE i % 20 <> 19
            UNION ALL
            SELECT i, i + 2 FROM base WHERE i % 20 < 18
            UNION ALL
            SELECT i, i + 20 FROM base
            WHERE i % 100 = 7 AND i + 20 < 2000
        ),
        und AS MATERIALIZED (
            SELECT DISTINCT a, b FROM (
                SELECT src AS a, dst AS b FROM ed
                UNION ALL SELECT dst, src FROM ed)
        ),
        nodes AS MATERIALIZED (SELECT DISTINCT a AS node FROM und),
        l0 AS (SELECT node, node AS label FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
        c{k} AS (
            SELECT u.a AS node, l.label, count(*) AS c
            FROM und u JOIN l{k - 1} l ON l.node = u.b
            GROUP BY 1, 2
        ),
        w{k} AS (
            SELECT node, label FROM (
                SELECT node, label, row_number() OVER (
                    PARTITION BY node ORDER BY c DESC, label ASC) AS rn
                FROM c{k})
            WHERE rn = 1
        ),
        l{k} AS MATERIALIZED (
            SELECT n.node, coalesce(w.label, n.node) AS label
            FROM nodes n LEFT JOIN w{k} w USING (node)
        )"""
        )
    parts.append(
        f"""
        SELECT node, label FROM l{iters} ORDER BY node"""
    )
    return "".join(parts)


def _pagerank_oracle_sql(iters: int = 8, damping: float = 0.85) -> str:
    """The pagerank recurrence unrolled as chained CTEs (one per power
    iteration). Constants are repr'd Python doubles so both engines
    parse the identical IEEE value; the graph is bidirectional so the
    dangling term is identically zero and omitted."""
    d = repr(damping)
    t = repr(1.0 - damping)
    parts = [
        f"""
        WITH {_TRADE_GRAPH_SQL},
        e AS MATERIALIZED (
            SELECT c AS src, s AS dst FROM pairs
            UNION ALL SELECT s AS src, c AS dst FROM pairs
        ),
        deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
        r0 AS (
            SELECT node, 1.0::DOUBLE / (SELECT cnt FROM nn) AS pr
            FROM nodes
        )"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
        r{k} AS MATERIALIZED (
            SELECT e.dst AS node,
                   {t}::DOUBLE / (SELECT cnt FROM nn)
                   + {d}::DOUBLE * sum(p.pr / dg.deg) AS pr
            FROM e
            JOIN r{k - 1} p ON p.node = e.src
            JOIN deg dg ON dg.src = e.src
            GROUP BY e.dst
        )"""
        )
    parts.append(
        f"""
        SELECT node, round(pr * (SELECT cnt FROM nn), 6) AS pr_n
        FROM r{iters} ORDER BY node"""
    )
    return "".join(parts)


def _ppr_oracle_sql(
    iters: int = 8, damping: float = 0.85, seed_mod: int = 97
) -> str:
    """Personalized PageRank unrolled as chained CTEs. The teleport
    vector tv (1/|S| on seeds, 0 elsewhere) rides a materialized node
    table; the graph is bidirectional so the dangling term is
    identically zero and omitted, exactly as in _pagerank_oracle_sql."""
    d = repr(damping)
    t = repr(1.0 - damping)
    parts = [
        f"""
        WITH {_TRADE_GRAPH_SQL},
        e AS MATERIALIZED (
            SELECT c AS src, s AS dst FROM pairs
            UNION ALL SELECT s AS src, c AS dst FROM pairs
        ),
        deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
        seeds AS (
            SELECT DISTINCT c AS node FROM pairs WHERE c % {seed_mod} = 0
        ),
        ns AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM seeds),
        nt AS MATERIALIZED (
            SELECT n.node,
                   CASE WHEN s.node IS NOT NULL
                        THEN 1.0::DOUBLE / (SELECT cnt FROM ns)
                        ELSE 0.0::DOUBLE END AS tv
            FROM nodes n LEFT JOIN seeds s ON s.node = n.node
        ),
        r0 AS (SELECT node, tv AS pr FROM nt)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
        r{k} AS MATERIALIZED (
            SELECT n.node,
                   {t}::DOUBLE * n.tv
                   + {d}::DOUBLE * coalesce(c.cc, 0.0::DOUBLE) AS pr
            FROM nt n
            LEFT JOIN (
                SELECT e.dst AS node, sum(p.pr / dg.deg) AS cc
                FROM e
                JOIN r{k - 1} p ON p.node = e.src
                JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst
            ) c ON c.node = n.node
        )"""
        )
    parts.append(
        f"""
        SELECT node, round(pr * (SELECT cnt FROM nn), 6) AS tr_n
        FROM r{iters} ORDER BY node"""
    )
    return "".join(parts)


def _hits_oracle_sql(iters: int = 6) -> str:
    """HITS unrolled: per iteration an auth aggregate + L1 normalize,
    then a hub aggregate + L1 normalize, exactly the operator's update
    order. Final select left-joins from the node universe so pure hubs
    carry auth 0 and vice versa."""
    parts = [
        f"""
        WITH {_TRADE_GRAPH_SQL},
        e AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs),
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM e
                UNION ALL SELECT dst AS node FROM e)
        ),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
        h0 AS (
            SELECT node, 1.0::DOUBLE / (SELECT cnt FROM nn) AS hub
            FROM nodes
        )"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
        a{k}raw AS MATERIALIZED (
            SELECT e.dst AS node, sum(h.hub) AS a
            FROM e JOIN h{k - 1} h ON h.node = e.src GROUP BY e.dst
        ),
        a{k} AS MATERIALIZED (
            SELECT node, a / (SELECT sum(a) FROM a{k}raw) AS auth
            FROM a{k}raw
        ),
        h{k}raw AS MATERIALIZED (
            SELECT e.src AS node, sum(a.auth) AS h
            FROM e JOIN a{k} a ON a.node = e.dst GROUP BY e.src
        ),
        h{k} AS MATERIALIZED (
            SELECT node, h / (SELECT sum(h) FROM h{k}raw) AS hub
            FROM h{k}raw
        )"""
        )
    parts.append(
        f"""
        SELECT n.node,
               round(coalesce(h.hub, 0.0::DOUBLE)
                     * (SELECT cnt FROM nn), 6) AS hub_n,
               round(coalesce(a.auth, 0.0::DOUBLE)
                     * (SELECT cnt FROM nn), 6) AS auth_n
        FROM nodes n
        LEFT JOIN h{iters} h ON h.node = n.node
        LEFT JOIN a{iters} a ON a.node = n.node
        ORDER BY n.node"""
    )
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    from smart_crawler_spark.operators.textops import (
        PII_EMAIL_RE as _PII_EMAIL,
        PII_IPV4_RE as _PII_IP,
        PII_PHONE_RE as _PII_PHONE,
    )

    doubled = (
        "SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 100000, text FROM documents"
    )
    wordset = (
        "list_filter(list_distinct(regexp_split_to_array(lower(text),"
        " '[^a-z0-9]+')), x -> x <> '')"
    )
    pats = " UNION ALL ".join(
        f"SELECT '{n}' AS pat_name, '{p}' AS pattern" for n, p in _REGEX_PATTERNS
    )
    cos_flat = (
        "SELECT vec_id, generate_subscripts(embedding, 1) AS i,"
        " CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings"
    )
    # Morton-key bit interleave, same static expansion as zorder_key
    zkey = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i + 1}) + (((y >> {i}) & 1) << {2 * i})"
        for i in range(12)
    )
    out = {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2024-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "frontier_dedup": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey NOT IN (
                SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
            )
            ORDER BY o_orderkey
        """,
        "per_host_topk": """
            SELECT o_custkey, o_orderkey, o_orderdate, rk FROM (
                SELECT o_custkey, o_orderkey, o_orderdate,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey ASC
                       ) AS rk
                FROM orders
            ) WHERE rk <= 3
            ORDER BY o_custkey, rk
        """,
        # IDN: closed-form punycode per planted host (RFC 3490
        # ToASCII values verified against the stdlib codec)
        "idn_hosts": """
            SELECT event_id,
                   CASE event_id % 5
                        WHEN 0 THEN 'crawl.example'
                        WHEN 1 THEN 'MÜNCHEN.example'
                        WHEN 2 THEN 'café.test'
                        WHEN 3 THEN 'Plain.Test'
                        ELSE 'bücher.example' END AS host,
                   CASE event_id % 5
                        WHEN 0 THEN 'crawl.example'
                        WHEN 1 THEN 'xn--mnchen-3ya.example'
                        WHEN 2 THEN 'xn--caf-dma.test'
                        WHEN 3 THEN 'plain.test'
                        ELSE 'xn--bcher-kva.example' END AS host_idn
            FROM events ORDER BY event_id
        """,
        "url_canonicalize": """
            WITH u AS (
                SELECT event_id,
                       'http://h' || (user_id % 5) || '.test' AS hostpart,
                       CASE WHEN event_id % 11 = 0 THEN '/'
                            ELSE '/p/' || event_id END AS path,
                       CASE WHEN event_id % 7 = 0
                            THEN 'k=' || (event_id % 3) END AS query,
                       CASE WHEN event_id % 5 = 0 THEN '#frag' ELSE '' END AS frag
                FROM events WHERE event_id < 2000
            )
            SELECT event_id,
                   hostpart || path
                     || CASE WHEN query IS NULL THEN '' ELSE '?' || query END
                     || frag AS url,
                   lower(split_part(hostpart, '//', 2)) AS host,
                   CASE WHEN path = '/' THEN ''
                        WHEN query IS NULL THEN path
                        ELSE path || query END AS rel_url
            FROM u
            ORDER BY event_id
        """,
        "url_trap_detect": "WITH " + _TRAP_URLS_SQL + _TRAP_FEATURES_SQL + """
            SELECT event_id, url, depth, repeat_frac, n_params, has_session,
                   calendar_trap,
                   (has_session OR calendar_trap OR depth >= 8
                    OR (depth >= 6 AND repeat_frac >= 0.5)
                    OR n_params >= 6) AS is_trap
            FROM h ORDER BY event_id
        """,
        "quantize_embeddings": """
            WITH v AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            s AS (
                SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) / 127.0
                           AS scale
                FROM v
            ),
            q AS (
                SELECT vec_id, v, scale,
                       CASE WHEN scale = 0
                            THEN list_transform(v, x -> 0)
                            ELSE list_transform(v,
                                 x -> CAST(floor(x / scale + 0.5) AS INT))
                       END AS q
                FROM s
            )
            SELECT vec_id, round(scale, 9) AS scale,
                   array_to_string(q, ',') AS q_csv,
                   round(CASE WHEN scale = 0 THEN 0.0 ELSE
                       list_max(list_transform(
                           generate_series(1, len(v)),
                           i -> abs(v[i] - CAST(q[i] AS DOUBLE) * scale)))
                       END, 9) AS max_abs_err
            FROM q ORDER BY vec_id
        """,
        "scd2_history": """
            WITH snaps AS (
                SELECT e.event_id, v.v AS ver,
                       CASE WHEN v.v < e.event_id % 3 + 1 THEN 'new'
                            WHEN v.v < 4 THEN 'seen'
                            ELSE 'expired' END AS status,
                       CASE WHEN v.v = 0 THEN NULL
                            ELSE (e.event_id + v.v // 2) % 3 END AS score
                FROM (SELECT event_id FROM events WHERE event_id < 500) e,
                     (SELECT unnest(generate_series(0, 4)) AS v) v
            ),
            flags AS (
                SELECT *,
                       CASE WHEN lag(ver) OVER w IS NULL
                             OR status IS DISTINCT FROM lag(status) OVER w
                             OR score IS DISTINCT FROM lag(score) OVER w
                            THEN 1 ELSE 0 END AS chg
                FROM snaps
                WINDOW w AS (PARTITION BY event_id ORDER BY ver)
            ),
            runs AS (
                SELECT *,
                       sum(chg) OVER (PARTITION BY event_id
                                      ORDER BY ver) AS run
                FROM flags
            ),
            agg AS (
                SELECT event_id, run, min(status) AS status,
                       min(score) AS score, min(ver) AS valid_from
                FROM runs GROUP BY event_id, run
            )
            SELECT event_id, status, score, valid_from,
                   lead(valid_from) OVER (PARTITION BY event_id
                       ORDER BY valid_from) AS valid_to
            FROM agg
            ORDER BY event_id, valid_from
        """,
        "quantized_topk": """
            WITH v AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            s AS (
                SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) / 127.0
                           AS scale
                FROM v
            ),
            qz AS (
                SELECT vec_id, scale,
                       CASE WHEN scale = 0
                            THEN list_transform(v, x -> 0)
                            ELSE list_transform(v,
                                 x -> CAST(floor(x / scale + 0.5) AS INT))
                       END AS q
                FROM s
            ),
            deq AS (
                SELECT vec_id,
                       list_transform(q,
                                      c -> CAST(c AS DOUBLE) * scale) AS dv
                FROM qz
            ),
            flat AS (
                SELECT vec_id, i, dv[i] AS v
                FROM deq, unnest(generate_series(1, len(dv))) AS t(i)
            ),
            dots AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       sum(q.v * c.v)
                         / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v)))
                           AS sim
                FROM flat q JOIN flat c ON q.i = c.i
                WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
                GROUP BY 1, 2
            ),
            ranked AS (
                SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(sim, 6) DESC, neighbor_id ASC
                       ) AS rank
                FROM dots
            )
            SELECT query_id, neighbor_id, cos_sim, rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        "weighted_sample": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_totalprice > 0
              AND ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                      ::BIGINT / 4294967296.0
                  < least(1.0, 0.5 * o_totalprice /
                          (SELECT max(o_totalprice) FROM orders))
            ORDER BY o_orderkey
        """,
        "snapshot_diff": """
            WITH old AS (
                SELECT event_id, event_type, user_id FROM events
                WHERE event_id < 3000
            ),
            new AS (
                SELECT event_id,
                       CASE WHEN event_id % 13 = 0 THEN 'upd'
                            ELSE event_type END AS event_type,
                       user_id
                FROM old WHERE event_id % 17 <> 0
                UNION ALL
                SELECT event_id + 100000, event_type, user_id
                FROM old WHERE event_id % 23 = 0
            )
            SELECT coalesce(n.event_id, o.event_id) AS event_id,
                   CASE WHEN o.event_id IS NULL THEN 'added'
                        WHEN n.event_id IS NULL THEN 'removed'
                        WHEN o.event_type IS NOT DISTINCT FROM n.event_type
                         AND o.user_id IS NOT DISTINCT FROM n.user_id
                        THEN 'unchanged'
                        ELSE 'changed' END AS change
            FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
            ORDER BY event_id
        """,
        "host_profile": "WITH " + _TRAP_URLS_SQL + _TRAP_FEATURES_SQL + """,
            t AS (
                SELECT host,
                       host || regexp_replace(path, '[0-9]+', '{d}', 'g')
                           AS template,
                       CASE WHEN has_session OR calendar_trap OR depth >= 8
                                 OR (depth >= 6 AND repeat_frac >= 0.5)
                                 OR n_params >= 6
                            THEN 1 ELSE 0 END AS is_trap
                FROM h
            )
            SELECT host, count(*) AS n_urls,
                   CAST(sum(is_trap) AS BIGINT) AS n_traps,
                   round(CAST(sum(is_trap) AS DOUBLE) / count(*), 6)
                       AS trap_rate,
                   count(DISTINCT template) AS n_templates
            FROM t GROUP BY host ORDER BY host
        """,
        "url_templates": "WITH " + _TRAP_URLS_SQL + """,
            t AS (
                SELECT url, host,
                       host || regexp_replace(
                           regexp_replace(regexp_replace(url,
                               '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                               '[?#].*$', ''),
                           '[0-9]+', '{d}', 'g') AS template
                FROM u
            )
            SELECT template, count(*) AS n_urls,
                   count(DISTINCT host) AS n_hosts,
                   min(url) AS sample_url
            FROM t GROUP BY template ORDER BY template
        """,
        "template_cap": "WITH " + _TRAP_URLS_SQL + """,
            t AS (
                SELECT event_id, url,
                       host || regexp_replace(
                           regexp_replace(regexp_replace(url,
                               '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                               '[?#].*$', ''),
                           '[0-9]+', '{d}', 'g') AS template
                FROM u
            )
            SELECT event_id, url, template FROM (
                SELECT event_id, url, template,
                       row_number() OVER (PARTITION BY template
                           ORDER BY url, event_id) AS rk
                FROM t
            ) WHERE rk <= 3
            ORDER BY template, url
        """,
        "mirror_detect": """
            WITH pages AS (
                SELECT 'http://m' || (doc_id % 6) || '.test/doc/' || doc_id
                           AS url,
                       'm' || (doc_id % 6) || '.test' AS host, text
                FROM documents
                UNION ALL
                SELECT 'http://m' || ((doc_id + 3) % 6) || '.test/mirror/'
                           || doc_id,
                       'm' || ((doc_id + 3) % 6) || '.test', text
                FROM documents WHERE doc_id % 4 = 0
            )
            SELECT md5(text) AS content_key,
                   count(DISTINCT host) AS n_hosts,
                   count(*) AS n_urls,
                   min(url) AS canonical_url,
                   array_to_string(list_sort(list(DISTINCT host)), ',')
                       AS hosts
            FROM pages
            GROUP BY md5(text)
            HAVING count(DISTINCT host) >= 2
            ORDER BY content_key
        """,
        "regex_join_eval": f"""
            SELECT pat_name, lang, count(*) AS n_docs
            FROM documents, ({pats}) p
            WHERE regexp_matches(text, p.pattern)
            GROUP BY pat_name, lang
            ORDER BY pat_name, lang
        """,
        "schema_groupby": """
            SELECT md5(lang || '|' || source) AS signature,
                   min(doc_id) AS first_doc, count(*) AS n_pages
            FROM documents
            GROUP BY 1 ORDER BY signature
        """,
        # phrase search: re-derive match positions with 1-based array
        # indexing over the identical whitespace tokenization
        "phrase_search": """
            WITH t AS (
                SELECT doc_id,
                       string_split_regex(lower(text), '\\s+') AS a
                FROM documents
            ),
            p AS (
                SELECT doc_id, a,
                       unnest(generate_series(
                           1, greatest(len(a) - 1, 0))) AS j
                FROM t
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
            FROM p
            WHERE a[j] = 'table' AND a[j + 1] = 'table'
            GROUP BY doc_id ORDER BY doc_id
        """,
        # unicode dedup: replay the triplet plant and the
        # lower(NFC(.)) key with DuckDB's nfc_normalize — every
        # complete triplet (b, b+1, b+2) is one group keyed by b
        "unicode_dedup": """
            WITH corpus AS (
                SELECT d.doc_id,
                       CASE d.doc_id % 3
                            WHEN 0 THEN 'Caf' || chr(233) || ' '
                            WHEN 1 THEN 'Cafe' || chr(769) || ' '
                            ELSE 'CAF' || chr(201) || ' ' END
                           || b.text AS text
                FROM documents d
                JOIN documents b ON b.doc_id = d.doc_id - d.doc_id % 3
                WHERE d.doc_id < 498
            ),
            keyed AS (
                SELECT doc_id,
                       lower(nfc_normalize(text)) AS nt
                FROM corpus
            ),
            g AS (
                SELECT nt, min(doc_id) AS group_id,
                       CAST(count(*) AS INT) AS n_docs
                FROM keyed GROUP BY nt HAVING count(*) >= 2
            )
            SELECT k.doc_id, g.group_id, g.n_docs
            FROM keyed k JOIN g USING (nt)
            ORDER BY k.doc_id
        """,
        "exact_dedup": f"""
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS text_hash,
                   min(doc_id) AS canonical_id,
                   count(*) AS dup_count
            FROM ({doubled})
            GROUP BY 1 ORDER BY text_hash
        """,
        "jaccard_near_dup": f"""
            WITH ws AS (
                SELECT doc_id, {wordset} AS w FROM documents WHERE doc_id < 60
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.w, b.w))), 6)
                       AS jaccard
            FROM ws a, ws b
            WHERE a.doc_id < b.doc_id
              AND CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.w, b.w))) >= 0.5
            ORDER BY id_a, id_b
        """,
        "decontaminate": """
            WITH wl AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), x -> x <> '') AS w
                FROM documents
            ),
            dg AS (
                SELECT doc_id, unnest(
                    CASE WHEN len(w) >= 13 THEN list_distinct(
                        list_transform(generate_series(1, len(w) - 12),
                                       i -> array_to_string(w[i:i+12], ' ')))
                    ELSE [] END) AS g
                FROM wl
            ),
            bwl AS (SELECT w[4:30] AS bw FROM wl WHERE doc_id % 25 = 0),
            bg AS (
                SELECT DISTINCT unnest(
                    CASE WHEN len(bw) >= 13 THEN
                        list_transform(generate_series(1, len(bw) - 12),
                                       i -> array_to_string(bw[i:i+12], ' '))
                    ELSE [] END) AS g
                FROM bwl
            ),
            hits AS (
                SELECT doc_id, count(*) AS n_hits
                FROM dg JOIN bg USING (g) GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
            ORDER BY d.doc_id
        """,
        "token_stats": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '')) AS ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS bpe_tokens,
                   length(text) AS n_chars
            FROM documents ORDER BY doc_id
        """,
        "language_id": f"""
            WITH ws AS (SELECT doc_id, {wordset} AS w FROM documents),
            s AS (
                SELECT doc_id,
                    len(list_intersect(w, ['the','and','of','to','in','is','that','with'])) AS score_en,
                    len(list_intersect(w, ['der','die','und','das','nicht','ist','ein','mit'])) AS score_de,
                    len(list_intersect(w, ['le','la','et','les','des','est','une','dans'])) AS score_fr
                FROM ws
            )
            SELECT doc_id, score_en, score_de, score_fr,
                   CASE WHEN greatest(score_en, score_de, score_fr) <= 0 THEN 'und'
                        WHEN score_en = greatest(score_en, score_de, score_fr) THEN 'en'
                        WHEN score_de = greatest(score_en, score_de, score_fr) THEN 'de'
                        ELSE 'fr' END AS pred_lang
            FROM s ORDER BY doc_id
        """,
        "quality_score": r"""
            WITH m AS (
                SELECT doc_id,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
                       CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
                       CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) AS n_upper,
                       CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                            x -> x <> '')) AS DOUBLE) AS n_words
                FROM documents
            )
            SELECT doc_id,
                   round(CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0 END, 6) AS alpha_ratio,
                   round(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END, 6) AS punct_ratio,
                   round(CASE WHEN n_words > 0 THEN n_chars / n_words ELSE 0 END, 6) AS mean_word_len,
                   round(least(n_words / 100.0, 1.0) * 0.4
                         + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0 END) * 0.3
                         + (1 - least((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END) * 5, 1.0)) * 0.2
                         + (1 - CASE WHEN n_alpha > 0 THEN n_upper / n_alpha ELSE 0 END) * 0.1, 6) AS quality
            FROM m ORDER BY doc_id
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
                   substring(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8) AS fp_bucket
            FROM documents ORDER BY doc_id
        """,
        "embedding_topk": f"""
            WITH flat AS ({cos_flat}),
            dots AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       sum(q.v * c.v)
                         / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS sim
                FROM flat q JOIN flat c ON q.i = c.i
                WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
                GROUP BY 1, 2
            ),
            ranked AS (
                SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(sim, 6) DESC, neighbor_id ASC
                       ) AS rank
                FROM dots
            )
            SELECT query_id, neighbor_id, cos_sim, rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        "embedding_near_dup": f"""
            WITH flat AS ({cos_flat}),
            pl AS (
                SELECT a.vec_id + 100000 AS vec_id, a.i, a.v + 0.18 * b.v AS v
                FROM flat a JOIN flat b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
            ),
            allf AS (SELECT * FROM flat UNION ALL SELECT * FROM pl),
            dots AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       sum(a.v * b.v)
                         / (sqrt(sum(a.v * a.v)) * sqrt(sum(b.v * b.v))) AS sim
                FROM allf a JOIN allf b ON a.i = b.i AND a.vec_id < b.vec_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, round(sim, 6) AS cos_sim
            FROM dots WHERE round(sim, 6) >= 0.95
            ORDER BY id_a, id_b
        """,
        "word_set_ops": f"""
            WITH ws AS (SELECT doc_id, {wordset} AS w FROM documents),
            v AS (SELECT ['spark','window','join','hash','table','stream'] AS varr)
            SELECT doc_id,
                   len(w) AS n_words,
                   len(list_intersect(w, varr)) AS n_vocab_hits,
                   len(list_filter(w, x -> NOT list_contains(varr, x))) AS n_other,
                   len(list_distinct(list_concat(w, varr))) AS n_union
            FROM ws, v ORDER BY doc_id
        """,
        "rollup_revenue": """
            SELECT o_orderpriority, o_orderstatus,
                   round(sum(o_totalprice), 2) AS total, count(*) AS n
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
            ORDER BY o_orderpriority ASC NULLS FIRST,
                     o_orderstatus ASC NULLS FIRST
        """,
        "q5_region_revenue": """
            SELECT r_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
            ORDER BY r_name, n_name
        """,
        "asof_latest_event": """
            SELECT o_orderkey, user_id, event_id, event_type
            FROM (
                SELECT o_orderkey, o_custkey % 50 AS user_id, o_orderdate
                FROM orders WHERE o_orderkey < 5000
            ) o
            ASOF LEFT JOIN (
                SELECT user_id AS e_user, ts, event_id, event_type
                FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY user_id, ts
                        ORDER BY event_id DESC
                    ) AS rn FROM events
                ) WHERE rn = 1
            ) e
            ON o.user_id = e.e_user AND e.ts <= o.o_orderdate
            ORDER BY o_orderkey
        """,
        "distinct_counts": """
            SELECT event_type, count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "event_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click') AS click,
                   count(*) FILTER (event_type = 'view') AS view,
                   count(*) FILTER (event_type = 'purchase') AS purchase,
                   count(*) FILTER (event_type = 'error') AS error
            FROM events WHERE user_id < 20
            GROUP BY user_id ORDER BY user_id
        """,
        "sessionize": """
            WITH g AS (
                SELECT user_id, event_id, ts,
                       CAST(floor(epoch(ts)) AS BIGINT)
                         - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS gap
                FROM events
            ),
            s AS (
                SELECT user_id, event_id,
                       sum(CASE WHEN gap IS NULL OR gap > 600 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM g
            ),
            per_sess AS (
                SELECT user_id, sess_id, count(*) AS n_events
                FROM s GROUP BY user_id, sess_id
            )
            SELECT user_id, count(*) AS n_sessions,
                   max(n_events) AS max_session_events
            FROM per_sess GROUP BY user_id ORDER BY user_id
        """,
        "q4_priority_semijoin": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_discount >= 0.08
            )
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "table_set_ops": """
            SELECT k, 'intersect' AS op FROM (
                SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderkey % 2 = 0
                INTERSECT
                SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 3 = 0
            )
            UNION ALL
            SELECT k, 'except' AS op FROM (
                SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderkey % 2 = 0
                EXCEPT
                SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 3 = 0
            )
            ORDER BY op, k
        """,
        "outlink_classify": """
            WITH pages AS (
                SELECT event_id,
                       'h' || (user_id % 7) || '.test' AS host,
                       CASE WHEN event_type = 'click' THEN 'detail'
                            ELSE 'dir' END AS src_class,
                       'http://h' || (user_id % 7) || '.test' AS base
                FROM events WHERE event_id < 4000
            ),
            links AS (
                SELECT src_class, base || '/p/' || event_id AS src_url, host,
                       '//div[@id=''list'']/a' AS xpath, 0 AS href_pos,
                       base || '/p/' || ((event_id * 2) % 9000) AS href
                FROM pages
                UNION ALL
                SELECT src_class, base || '/p/' || event_id, host,
                       '//div[@id=''list'']/a', 1,
                       base || '/p/' || ((event_id * 2) % 9000 + 1)
                FROM pages
                UNION ALL
                SELECT src_class, base || '/p/' || event_id, host,
                       '//ul[@id=''menu'']/li/a', 0,
                       base || '/dir' || (event_id % 4)
                FROM pages
                UNION ALL
                SELECT src_class, base || '/p/' || event_id, host,
                       '//form[@id=''q'']', 0,
                       base || '/search>q=' || (event_id % 3)
                FROM pages
            ),
            model(m_class, m_xpath, edge_pos, dst_class, dst_depth) AS (VALUES
                ('detail', '//div[@id=''list'']/a', 0, 'detail', 2),
                ('detail', '//ul[@id=''menu'']/li/a', 1, 'dir', 1),
                ('dir', '//div[@id=''list'']/a', 0, 'detail', 2),
                ('dir', '//form[@id=''q'']', 1, 'search', 2))
            SELECT split_part(href, '>', 1) AS url, host,
                   dst_class AS page_class, dst_depth AS class_depth,
                   CASE WHEN href LIKE '%>%'
                        THEN split_part(href, '>', 2) END AS form_params,
                   src_url,
                   CAST(edge_pos AS BIGINT) * 1000000000 + href_pos AS link_seq
            FROM links JOIN model
              ON src_class = m_class AND xpath = m_xpath
            ORDER BY src_url, link_seq
        """,
        "xpath_idf": f"""
            WITH ws AS (SELECT doc_id, {wordset} AS w FROM documents),
            ex AS (SELECT unnest(w) AS word FROM ws),
            d AS (SELECT word, count(*) AS df FROM ex GROUP BY word),
            n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT word, df,
                   round(ln(CAST(n_docs AS DOUBLE) / df), 6) AS idf,
                   round(1.0 / (ln(CAST(n_docs AS DOUBLE) / df) + 1), 6)
                       AS weight
            FROM d, n WHERE df >= 5 ORDER BY word
        """,
        "cluster_metrics": """
            WITH m AS (
                SELECT source AS cluster_id, lang, count(*) AS n
                FROM documents GROUP BY source, lang
            ),
            per AS (
                SELECT cluster_id, CAST(sum(n) AS BIGINT) AS csize,
                       max(n) AS mx, sum(n * ln(n)) AS nln
                FROM m GROUP BY cluster_id
            )
            SELECT cluster_id, csize,
                   round(CAST(mx AS DOUBLE) / csize, 6) AS purity,
                   round(ln(csize) - nln / csize, 6) AS cohesion
            FROM per ORDER BY cluster_id
        """,
        "bfs_depths": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT event_id % 97 AS src,
                       (event_id * 31 + 7) % 97 AS dst
                FROM events WHERE event_id < 2000
            ),
            bfs(node, depth) AS (
                SELECT CAST(0 AS BIGINT), 0
                UNION
                SELECT e.dst, b.depth + 1
                FROM bfs b JOIN e ON e.src = b.node
                WHERE b.depth < 6
            )
            SELECT node, min(depth) AS depth FROM bfs
            GROUP BY node ORDER BY node
        """,
        "streaming_ingest_dedup": """
            SELECT DISTINCT
                   'http://h' || (event_id % 4) || '.test/p/'
                       || (event_id % 1500) AS url,
                   'h' || (event_id % 4) || '.test' AS host,
                   CASE WHEN (event_id % 1500) % 3 = 0 THEN 'detail'
                        ELSE 'dir' END AS page_class,
                   CAST((event_id % 1500) % 3 AS INT) AS class_depth
            FROM events WHERE event_id < 6000
            ORDER BY url
        """,
        "streaming_late_drop": """
            WITH w1 AS (
                SELECT 'h' || (event_id % 3) || '.test' AS host,
                       (event_id % 11) AS m
                FROM events WHERE event_id < 200
            ),
            w2 AS (
                SELECT 'h' || (event_id % 3) || '.test' AS host,
                       CASE WHEN event_id % 2 = 0 THEN event_id % 4
                            WHEN event_id % 4 = 1 THEN 9
                            ELSE 10 END AS m,
                       (event_id % 2 = 0) AS late
                FROM events WHERE event_id >= 200 AND event_id < 400
            ),
            ontime AS (
                SELECT host, m FROM w1
                UNION ALL
                -- late wave-2 rows (windows ended below the restored
                -- 8:00 watermark) are DROPPED by the engine
                SELECT host, m FROM w2 WHERE NOT late
            )
            SELECT TIMESTAMP '2024-03-01 00:00:00'
                       + m * INTERVAL 1 MINUTE AS start,
                   TIMESTAMP '2024-03-01 00:00:00'
                       + (m + 1) * INTERVAL 1 MINUTE AS "end",
                   host, count(*) AS n_urls
            FROM ontime GROUP BY host, m
            ORDER BY start, host
        """,
        # stream-stream join: the joined multiset stated in SQL —
        # wave-1 in-bound pairs (latency 1-2 min; the +7 responses fail
        # the 5-minute range condition) plus wave-2 cross-batch pairs
        # whose dispatch (minute >= 7) was still in the state store;
        # wave-2 late responses (dispatch minute < 3) are dropped
        "streaming_fetch_join": """
            WITH d AS (
                SELECT event_id,
                       'http://h' || (event_id % 3) || '.test/p/'
                           || event_id AS url,
                       'h' || (event_id % 3) || '.test' AS host,
                       (event_id % 11) AS dm
                FROM events WHERE event_id < 200
            ),
            j AS (
                SELECT url, host, dm,
                       dm + 1 + (event_id % 2) AS rm,
                       CASE WHEN event_id % 7 = 0 THEN 404
                            ELSE 200 END AS status
                FROM d WHERE event_id % 3 <> 0
                UNION ALL
                SELECT url, host, dm, dm + 2 AS rm, 200 AS status
                FROM d WHERE event_id % 3 = 0 AND dm >= 7
            )
            SELECT url, host,
                   1709251200 + dm * 60 AS dispatch_s,
                   1709251200 + rm * 60 AS response_s,
                   (rm - dm) * 60 AS latency_s,
                   status
            FROM j ORDER BY url
        """,
        # stream-static enrich: the full left join stated in SQL;
        # every 7th candidate (host h9) keeps null profile columns
        "streaming_static_enrich": """
            WITH c AS (
                SELECT CASE WHEN event_id % 7 = 0 THEN 9
                            ELSE event_id % 3 END AS hn,
                       event_id
                FROM events WHERE event_id < 500
            )
            SELECT 'http://h' || hn || '.test/p/' || event_id AS url,
                   'h' || hn || '.test' AS host,
                   1709251200 + event_id AS ts_s,
                   CASE hn WHEN 0 THEN 'news' WHEN 1 THEN 'shop'
                           WHEN 2 THEN 'forum' END AS host_class,
                   CAST(CASE hn WHEN 0 THEN 3 WHEN 1 THEN 1
                                WHEN 2 THEN 2 END AS INT)
                       AS crawl_priority
            FROM c ORDER BY url
        """,
        # bounded-state streaming dedup: one row per url at its wave-1
        # minute + the closer + a second emission for expired-state
        # re-arrivals; within-watermark dups and late rows drop
        "streaming_dedup_ttl": """
            WITH d AS (
                SELECT 'http://h' || (event_id % 3) || '.test/p/'
                           || event_id AS url,
                       'h' || (event_id % 3) || '.test' AS host,
                       (event_id % 11) AS m,
                       event_id
                FROM events WHERE event_id < 200
            )
            SELECT url, host, 1709251200 + m * 60 AS ts_s FROM d
            UNION ALL
            SELECT 'http://closer.test/p/0', 'closer.test',
                   1709251200 + 60 * 60
            UNION ALL
            SELECT url, host, 1709251200 + 59 * 60 FROM d
            WHERE event_id % 5 = 0
            ORDER BY url, ts_s
        """,
        # left-outer variant: the matched multiset (wave-1 in-bound
        # pairs) plus one null-response TIMEOUT row per unmatched
        # dispatch — the wave-2 closers push the watermark to 58:00
        # and the trailing no-data batch evicts every real dispatch;
        # matched dispatches never re-emit, closers stay open
        "streaming_fetch_timeout": """
            WITH d AS (
                SELECT event_id,
                       'http://h' || (event_id % 3) || '.test/p/'
                           || event_id AS url,
                       'h' || (event_id % 3) || '.test' AS host,
                       (event_id % 11) AS dm
                FROM events WHERE event_id < 200
            )
            SELECT url, host,
                   1709251200 + dm * 60 AS dispatch_s,
                   1709251200 + (dm + 1 + (event_id % 2)) * 60
                       AS response_s,
                   (1 + (event_id % 2)) * 60 AS latency_s,
                   CAST(CASE WHEN event_id % 7 = 0 THEN 404
                             ELSE 200 END AS INT) AS status
            FROM d WHERE event_id % 3 <> 0
            UNION ALL
            SELECT url, host,
                   1709251200 + dm * 60 AS dispatch_s,
                   CAST(NULL AS BIGINT) AS response_s,
                   CAST(NULL AS BIGINT) AS latency_s,
                   CAST(NULL AS INT) AS status
            FROM d WHERE event_id % 3 = 0
            ORDER BY url
        """,
        # streaming session windows: the identical planted multiset
        # minus late rows and closers, gaps-and-islands with the same
        # >= 5-minute break rule (Spark session_window end is exclusive,
        # so a gap of exactly 5 minutes starts a new session), session
        # end = last event + gap
        "streaming_session_window": """
            WITH ev AS (
                SELECT 'h' || (i % 3)::VARCHAR || '.test' AS host,
                       ((i // 3) % 4) + 10 * ((i // 3) // 4) AS m
                FROM range(120) t(i)
                UNION ALL
                SELECT 'h' || (h)::VARCHAR || '.test', 94 + j
                FROM range(3) a(h), range(2) b(j)
            ),
            s AS (
                SELECT host, m,
                       CASE WHEN lag(m) OVER w IS NULL
                            OR m - lag(m) OVER w >= 5 THEN 1 ELSE 0
                       END AS brk
                FROM ev
                WINDOW w AS (PARTITION BY host ORDER BY m)
            ),
            g AS (
                SELECT host, m,
                       sum(brk) OVER (PARTITION BY host ORDER BY m
                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM s
            )
            SELECT host,
                   1709251200 + min(m) * 60 AS sess_start_s,
                   1709251200 + max(m) * 60 + 300 AS sess_end_s,
                   count(*)::BIGINT AS n_events
            FROM g GROUP BY host, sid
            ORDER BY host, sess_start_s
        """,
        "streaming_host_rate": """
            WITH e AS (
                SELECT event_id % 4 AS h,
                       TIMESTAMP '2024-01-01'
                         + INTERVAL 1 SECOND * event_id AS ts
                FROM events WHERE event_id < 6000
            )
            SELECT 'h' || h || '.test' AS host,
                   count(*) AS n_urls,
                   min(ts) AS first_ts,
                   max(ts) AS last_ts,
                   round(CAST(epoch(max(ts)) - epoch(min(ts)) AS DOUBLE)
                         / (count(*) - 1), 4) AS mean_gap_s
            FROM e GROUP BY h ORDER BY host
        """,
        "robots_filter": """
            WITH u AS (
                SELECT event_id,
                       'h' || (user_id % 5) || '.test' AS host,
                       CASE WHEN event_id % 11 = 0 THEN '/'
                            ELSE '/p/' || event_id END AS path,
                       CASE WHEN event_id % 7 = 0
                            THEN '?k=' || (event_id % 3) ELSE '' END AS q
                FROM events WHERE event_id < 2000
            ),
            uu AS (
                SELECT event_id, 'http://' || host || path || q AS url,
                       host, path || q AS pathq
                FROM u
            ),
            r(host, allow, pattern, plen, is_exact) AS (VALUES
                ('h0.test', false, '/p/', 3, false),
                ('h0.test', true,  '/p/1', 4, false),
                ('h1.test', false, '/p/7', 5, true),
                ('h3.test', false, '/', 1, false),
                ('h4.test', true,  '/p/', 3, false),
                ('h4.test', false, '/p/', 3, false)),
            m AS (
                SELECT uu.event_id, r.allow, r.plen
                FROM uu JOIN r ON uu.host = r.host
                 AND (CASE WHEN r.is_exact THEN uu.pathq = r.pattern
                      ELSE starts_with(uu.pathq, r.pattern) END)
            ),
            best AS (
                SELECT event_id, allow FROM (
                    SELECT event_id, allow, row_number() OVER (
                        PARTITION BY event_id
                        ORDER BY plen DESC, allow DESC) AS rn
                    FROM m) WHERE rn = 1
            )
            SELECT uu.event_id, uu.url, uu.host
            FROM uu LEFT JOIN best USING (event_id)
            WHERE coalesce(best.allow, true)
            ORDER BY event_id, url
        """,
        "image_decode_verify": """
            SELECT 'img' || i AS image_id,
                   CASE WHEN i % 10 = 9 THEN 'jpeg' ELSE 'png' END AS fmt,
                   true AS ok,
                   true AS invariant_ok
            FROM range(500) t(i)
            ORDER BY image_id
        """,
        "image_patch_verify": """
            SELECT 'img' || i AS image_id,
                   CAST(((32 + (i % 4) * 16) // 8)
                        * ((24 + (i % 3) * 16) // 8) AS INT) AS n_patches,
                   true AS ok
            FROM range(500) t(i)
            ORDER BY image_id
        """,
        "watermark_detect": """
            WITH planted AS (
                SELECT i,
                       CASE WHEN i % 10 = 9 THEN 'jpeg' ELSE 'png' END AS fmt
                FROM range(500) t(i)
                WHERE i % 7 = 6
            )
            SELECT 'img' || i AS image_id, 1 AS py, 1 AS px,
                   CAST(count(*) OVER (PARTITION BY fmt) AS INT) AS n_images
            FROM planted
            ORDER BY image_id
        """,
        "watermark_detect_perceptual": """
            WITH planted AS (
                SELECT i FROM range(500) t(i) WHERE i % 7 = 6
            )
            SELECT 'img' || i AS image_id, 1 AS py, 1 AS px,
                   CAST((SELECT count(*) FROM planted) AS INT) AS n_images
            FROM planted
            ORDER BY image_id
        """,
        "image_augment_verify": """
            SELECT 'img' || i AS image_id, a.aug,
                   CAST(CASE WHEN a.aug = 'rot90' THEN 24 + (i % 3) * 16
                             ELSE 32 + (i % 4) * 16 END AS INT) AS out_w,
                   CAST(CASE WHEN a.aug = 'rot90' THEN 32 + (i % 4) * 16
                             ELSE 24 + (i % 3) * 16 END AS INT) AS out_h,
                   true AS ok
            FROM range(500) t(i),
                 (VALUES ('hflip'), ('rot90')) a(aug)
            ORDER BY image_id, aug
        """,
        # metadata audit: planted iff i%3==2 AND the row is PNG
        # (i%10 != 9); each plant carries exactly the Author+Software
        # pair with the idx-keyed email
        "image_metadata_audit": """
            WITH planted AS (
                SELECT i FROM range(500) t(i)
                WHERE i % 3 = 2 AND i % 10 <> 9
            )
            SELECT 'img' || i AS image_id, k.key,
                   CASE WHEN k.key = 'Author'
                        THEN 'user' || i || '@example.com'
                        ELSE 'smartgen 1.0' END AS value
            FROM planted, (VALUES ('Author'), ('Software')) k(key)
            ORDER BY image_id, k.key
        """,
        "image_metadata_strip": """
            SELECT 'img' || i AS image_id,
                   CASE WHEN i % 10 = 9 THEN 'jpeg' ELSE 'png' END AS fmt,
                   CAST(CASE WHEN i % 3 = 2 AND i % 10 <> 9 THEN 2
                             ELSE 0 END AS INT) AS n_before,
                   CAST(0 AS INT) AS n_after,
                   true AS pixels_ok
            FROM range(500) t(i)
            ORDER BY image_id
        """,
        # scene cuts: the plant rule puts a hard cut at every multiple
        # of the per-video scene length (4 + v%3) below n_frames=12
        "video_scene_cuts": """
            SELECT 'vid' || v AS video_id,
                   CAST(c * (4 + v % 3) AS INT) AS cut_frame,
                   CAST(c AS INT) AS scene_no
            FROM range(60) t(v), range(1, 3) s(c)
            WHERE c * (4 + v % 3) < 12
            ORDER BY video_id, cut_frame
        """,
        "video_frame_sample": """
            SELECT 'vid' || v AS video_id, CAST(f AS INT) AS frame_no,
                   CAST(32 + (v % 3) * 16 AS INT) AS w,
                   CAST(24 + (v % 2) * 16 AS INT) AS h,
                   true AS psnr_ok
            FROM range(60) t(v), (VALUES (0), (5), (10)) s(f)
            ORDER BY video_id, frame_no
        """,
        # audio near-dup: the sawtooth sign pattern is a pure function
        # of the period class i%25 (amplitude cancels: nonneg iff
        # 2*(t%p) >= p-1), and planted 7/8-gain dups (i%8==7) keep
        # every sign — so fingerprint groups are exactly the classes,
        # with dup clips adopting their source's class (i-1)%25
        "audio_near_dup": """
            WITH cls AS (
                SELECT i,
                       CASE WHEN i % 8 = 7 THEN (i - 1) % 25
                            ELSE i % 25 END AS k
                FROM range(100) t(i)
            ),
            g AS (
                SELECT k, min('clip' || i) AS group_id,
                       CAST(count(*) AS INT) AS n_clips
                FROM cls GROUP BY k HAVING count(*) >= 2
            )
            SELECT 'clip' || i AS clip_id, g.group_id, g.n_clips
            FROM cls JOIN g USING (k)
            ORDER BY clip_id
        """,
        "audio_features": """
            WITH params AS (
                SELECT a, 40 + (a % 25) * 8 AS p,
                       12000 + (a % 5) * 3000 AS amp
                FROM range(100) c(a)
            ),
            s AS (
                SELECT a, t, CAST(t // 800 AS INT) AS win,
                       ((t % p) * 2 * amp) // (p - 1) - amp AS v
                FROM params, range(4000) ts(t)
            ),
            l AS (
                SELECT a, win, v,
                       lag(v) OVER (PARTITION BY a, win ORDER BY t) AS pv
                FROM s
            )
            SELECT 'clip' || a AS clip_id, win AS window_no,
                   round(sqrt(avg(CAST(v AS DOUBLE) * v)), 4) AS rms,
                   CAST(count(*) FILTER (WHERE v * pv < 0) AS INT) AS zcr,
                   CAST(max(abs(v)) AS INT) AS peak,
                   CAST(sum(v) AS BIGINT) AS sum_amp,
                   true AS ok
            FROM l GROUP BY a, win
            ORDER BY clip_id, window_no
        """,
        "supplier_region_stats": """
            WITH j AS (
                SELECT r_name, s_suppkey, s_acctbal FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
            ),
            s AS (
                SELECT r_name, count(*) AS n_suppliers,
                       round(avg(s_acctbal), 4) AS avg_acctbal
                FROM j GROUP BY r_name
            ),
            t AS (
                SELECT r_name, s_suppkey AS top_suppkey,
                       round(s_acctbal, 2) AS top_acctbal
                FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY r_name
                        ORDER BY s_acctbal DESC, s_suppkey DESC
                    ) AS rn FROM j
                ) WHERE rn = 1
            )
            SELECT s.r_name, n_suppliers, avg_acctbal,
                   top_suppkey, top_acctbal
            FROM s JOIN t USING (r_name) ORDER BY r_name
        """,
        "skew_salted_agg": """
            SELECT l_returnflag,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_revenue,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q13_cust_order_dist": """
            SELECT c_count, count(*) AS custdist
            FROM (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c
                LEFT OUTER JOIN orders o
                  ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '1-URGENT'
                GROUP BY c.c_custkey
            )
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q16_supplier_cnt": """
            SELECT p.p_brand, p.p_size,
                   count(DISTINCT l.l_suppkey) AS supplier_cnt
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 3
            )
            GROUP BY p.p_brand, p.p_size
            ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
        """,
        "q17_small_quantity": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
                   count(*) AS n_items
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#4'
              AND l_quantity < (
                  SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                  WHERE l2.l_partkey = part.p_partkey
              )
        """,
        "cube_order_counts": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus ASC NULLS FIRST,
                     o_orderpriority ASC NULLS FIRST
        """,
        "brand_top_part": """
            SELECT p_brand, p_partkey AS top_partkey,
                   round(p_retailprice, 2) AS top_price
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY p_brand
                    ORDER BY p_retailprice DESC, p_partkey DESC
                ) AS rn FROM part
            ) WHERE rn = 1 ORDER BY p_brand
        """,
        "rolling_avg_events": """
            SELECT user_id, event_id,
                   round(avg(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                   ), 6) AS roll_avg
            FROM events WHERE user_id < 100
            ORDER BY user_id, event_id
        """,
        "ntile_quartiles": """
            SELECT o_orderpriority, quartile, count(*) AS n,
                   round(min(o_totalprice), 2) AS lo,
                   round(max(o_totalprice), 2) AS hi
            FROM (
                SELECT o_orderpriority, o_totalprice,
                       ntile(4) OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice ASC, o_orderkey ASC
                       ) AS quartile
                FROM orders
            )
            GROUP BY o_orderpriority, quartile
            ORDER BY o_orderpriority, quartile
        """,
        "price_percentiles": """
            SELECT p_brand,
                   round(quantile_cont(p_retailprice, 0.25), 4) AS p25,
                   round(quantile_cont(p_retailprice, 0.5), 4) AS p50,
                   round(quantile_cont(p_retailprice, 0.75), 4) AS p75,
                   count(*) AS n
            FROM part GROUP BY p_brand ORDER BY p_brand
        """,
        "hourly_event_windows": """
            SELECT date_trunc('hour', ts) AS win_start, event_type,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY 1, 2 ORDER BY win_start, event_type
        """,
        "approx_quantiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.498), 4) AS p50_lo,
                   true AS p50_ok, true AS p90_ok, true AS p99_ok
            FROM lineitem
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "repetition_stats": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), x -> x <> '') AS ws
                FROM documents
            ), g AS (
                SELECT doc_id, ws,
                       list_transform(generate_series(1, len(ws) - 1),
                           i -> ws[i] || ' ' || ws[i+1]) AS bg,
                       list_transform(generate_series(1, len(ws) - 2),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                           AS tg
                FROM w
            )
            SELECT doc_id, len(ws) AS n_words,
                   round(CASE WHEN len(ws) > 0 THEN
                       1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
                       ELSE 0.0 END, 6) AS dup_word_frac,
                   round(CASE WHEN len(bg) > 0 THEN
                       1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
                       ELSE 0.0 END, 6) AS dup_bigram_frac,
                   round(CASE WHEN len(tg) > 0 THEN
                       1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
                       ELSE 0.0 END, 6) AS dup_trigram_frac
            FROM g ORDER BY doc_id
        """,
        "interval_range_join": """
            SELECT c.event_id AS click_id, p.event_id AS purchase_id
            FROM (SELECT event_id, ts FROM events
                  WHERE event_type = 'click') c
            JOIN (SELECT event_id,
                         ts - INTERVAL 5 MINUTE AS lo,
                         ts + INTERVAL 5 MINUTE AS hi
                  FROM events WHERE event_type = 'purchase') p
              ON c.ts >= p.lo AND c.ts <= p.hi
            ORDER BY click_id, purchase_id
        """,
        "sequence_pack": r"""
            WITH t AS (
                SELECT doc_id,
                       CAST(len(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS BIGINT) AS n_tokens,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           ::BIGINT % 64 AS bucket
                FROM documents
            ), s AS (
                SELECT doc_id, n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (
                           ORDER BY bucket, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS strt
                FROM t
            )
            SELECT doc_id, n_tokens,
                   CAST(floor(strt / 512.0) AS BIGINT) AS seq_id,
                   CAST(strt % 512 AS BIGINT) AS seq_offset,
                   floor((strt + greatest(n_tokens, 1) - 1) / 512.0)
                       > floor(strt / 512.0) AS straddles
            FROM s
            ORDER BY doc_id
        """,
        # identical layout replay: same md5 bucketing, same
        # (bucket, id) stream order, one flat window cumsum; strlen =
        # VARCHAR byte length in DuckDB (octet_length is BLOB-only)
        "shard_pack": r"""
            WITH t AS (
                SELECT doc_id,
                       CAST(strlen(text) AS BIGINT) AS n_bytes,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           ::BIGINT % 64 AS bucket
                FROM documents
            ), s AS (
                SELECT doc_id, n_bytes,
                       CAST(COALESCE(SUM(n_bytes) OVER (
                           ORDER BY bucket, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS strt
                FROM t
            )
            SELECT doc_id, n_bytes,
                   CAST(floor(strt / 65536.0) AS BIGINT) AS shard_id,
                   CAST(strt % 65536 AS BIGINT) AS shard_offset,
                   floor((strt + greatest(n_bytes, 1) - 1) / 65536.0)
                       > floor(strt / 65536.0) AS overflows
            FROM s
            ORDER BY doc_id
        """,
        "stratified_sample": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders
            WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                      ::BIGINT / 4294967296.0
                  < CASE o_orderstatus
                        WHEN 'F' THEN 0.25
                        WHEN 'O' THEN 0.10
                        WHEN 'P' THEN 0.50
                        ELSE 0.0 END
            ORDER BY o_orderkey
        """,
        "minhash_near_dup": f"""
            WITH ws AS (
                SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9]+'), x -> x <> '') AS w
                FROM ({doubled})
                WHERE doc_id % 100000 < 1000
            ),
            sh AS (
                SELECT doc_id,
                       CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                            ELSE list_distinct(list_transform(
                                 generate_series(1, len(w) - 2),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                       END AS s
                FROM ws
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 6)
                       AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              -- J >= 0.8 implies min(|A|,|B|)*5 >= max(|A|,|B|)*4:
              -- cheap superset prefilter before the set intersection
             AND len(a.s) * 5 >= len(b.s) * 4 AND len(b.s) * 5 >= len(a.s) * 4
            WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                        / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.8
            ORDER BY id_a, id_b
        """,
        "incremental_near_dup": """
            WITH w0 AS (
                SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9]+'), x -> x <> '') AS w
                FROM documents
            ),
            batch AS (
                SELECT doc_id + 200000 AS doc_id, w FROM w0
                WHERE doc_id % 5 = 0
                UNION ALL
                SELECT doc_id + 300000, w[1 : CAST(len(w) - len(w)//12 - 1 AS INT)]
                FROM w0 WHERE doc_id % 7 = 0 AND len(w) >= 30
                UNION ALL
                SELECT doc_id + 400000, list_reverse(w) FROM w0
                WHERE doc_id % 11 = 0
            ),
            shc AS (
                SELECT doc_id,
                       CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                            ELSE list_distinct(list_transform(
                                 generate_series(1, len(w) - 2),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                       END AS s
                FROM w0
            ),
            shb AS (
                SELECT doc_id,
                       CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                            ELSE list_distinct(list_transform(
                                 generate_series(1, len(w) - 2),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                       END AS s
                FROM batch
            ),
            hits AS (
                SELECT b.doc_id AS doc_id, c.doc_id AS dup_of,
                       round(CAST(len(list_intersect(b.s, c.s)) AS DOUBLE)
                             / len(list_distinct(list_concat(b.s, c.s))), 6)
                           AS jaccard
                FROM shb b JOIN shc c
                  ON len(b.s) * 5 >= len(c.s) * 4
                 AND len(c.s) * 5 >= len(b.s) * 4
                WHERE round(CAST(len(list_intersect(b.s, c.s)) AS DOUBLE)
                      / len(list_distinct(list_concat(b.s, c.s))), 6) >= 0.8
            ),
            best AS (
                SELECT doc_id, dup_of, jaccard,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY jaccard DESC, dup_of ASC) AS rn
                FROM hits
            )
            SELECT b.doc_id,
                   best.dup_of IS NOT NULL AS is_dup,
                   coalesce(best.dup_of, -1) AS dup_of,
                   coalesce(best.jaccard, 0.0) AS jaccard
            FROM batch b
            LEFT JOIN (SELECT * FROM best WHERE rn = 1) best USING (doc_id)
            ORDER BY doc_id
        """,
        "near_dup_components": f"""
            WITH RECURSIVE ws AS (
                SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9]+'), x -> x <> '') AS w
                FROM ({doubled})
                WHERE doc_id % 100000 < 1000
            ),
            sh AS (
                SELECT doc_id,
                       CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                            ELSE list_distinct(list_transform(
                                 generate_series(1, len(w) - 2),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                       END AS s
                FROM ws
            ),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                 AND len(a.s) * 5 >= len(b.s) * 4
                 AND len(b.s) * 5 >= len(a.s) * 4
                WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.8
            ),
            edges AS (
                SELECT id_a AS s, id_b AS d FROM pairs
                UNION ALL
                SELECT id_b AS s, id_a AS d FROM pairs
            ),
            reach(a, b) AS (
                SELECT doc_id, doc_id FROM ws
                UNION
                SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
            )
            SELECT a AS doc_id, min(b) AS component
            FROM reach GROUP BY a ORDER BY doc_id
        """,
        "simhash_near_dup": f"""
            WITH toks AS (
                SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                       lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
                FROM ({doubled})
                WHERE doc_id % 100000 < 1000
            ),
            tc AS (
                SELECT doc_id, tok, count(*) AS cnt
                FROM toks GROUP BY doc_id, tok
            ),
            th AS (
                SELECT doc_id,
                       ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, cnt
                FROM tc
            ),
            bits AS (
                SELECT doc_id, i,
                       sum(CASE WHEN (h >> i) & 1 = 1 THEN cnt ELSE -cnt END)
                           AS vote
                FROM th, range(64) t(i) GROUP BY doc_id, i
            ),
            sig AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN vote > 0 THEN (1::UBIGINT << i)
                                     ELSE 0 END) AS UBIGINT) AS sh
                FROM bits GROUP BY doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.sh, b.sh)) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
            ORDER BY id_a, id_b
        """,
        "lsh_embedding_topk": f"""
            WITH flat AS ({cos_flat}),
            dots AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       sum(q.v * c.v)
                         / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS sim
                FROM flat q JOIN flat c ON q.i = c.i
                WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
                GROUP BY 1, 2
            ),
            ranked AS (
                SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(sim, 6) DESC, neighbor_id ASC
                       ) AS rank
                FROM dots
            )
            SELECT query_id, neighbor_id, cos_sim, rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        "ivf_embedding_topk": f"""
            WITH flat AS ({cos_flat}),
            q AS (
                SELECT a.vec_id + 100000 AS vec_id, a.i, a.v + 0.18 * b.v AS v
                FROM flat a JOIN flat b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
                WHERE a.vec_id < 5
            ),
            dots AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       sum(q.v * c.v)
                         / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS sim
                FROM q JOIN flat c ON q.i = c.i
                GROUP BY 1, 2
            ),
            ranked AS (
                SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(sim, 6) DESC, neighbor_id ASC
                       ) AS rank
                FROM dots
            )
            SELECT query_id, neighbor_id, cos_sim, rank
            FROM ranked WHERE rank <= 1
            ORDER BY query_id
        """,
        "pq_embedding_topk": f"""
            WITH flat AS ({cos_flat}),
            q AS (
                SELECT a.vec_id + 100000 AS vec_id, a.i, a.v + 0.18 * b.v AS v
                FROM flat a JOIN flat b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
                WHERE a.vec_id < 5
            ),
            dots AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       sum(q.v * c.v)
                         / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS sim
                FROM q JOIN flat c ON q.i = c.i
                GROUP BY 1, 2
            ),
            ranked AS (
                SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(sim, 6) DESC, neighbor_id ASC
                       ) AS rank
                FROM dots
            )
            SELECT query_id, neighbor_id, cos_sim, rank
            FROM ranked WHERE rank <= 1
            ORDER BY query_id
        """,
        "ivfpq_embedding_topk": f"""
            WITH flat AS ({cos_flat}),
            q AS (
                SELECT a.vec_id + 100000 AS vec_id, a.i, a.v + 0.18 * b.v AS v
                FROM flat a JOIN flat b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
                WHERE a.vec_id < 5
            ),
            dots AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       sum(q.v * c.v)
                         / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS sim
                FROM q JOIN flat c ON q.i = c.i
                GROUP BY 1, 2
            ),
            ranked AS (
                SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(sim, 6) DESC, neighbor_id ASC
                       ) AS rank
                FROM dots
            )
            SELECT query_id, neighbor_id, cos_sim, rank
            FROM ranked WHERE rank <= 1
            ORDER BY query_id
        """,
        "approx_distinct_hll": """
            SELECT event_type, count(DISTINCT user_id) AS exact_users,
                   count(*) AS n_events, true AS hll_ok
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "phash_near_dup": """
            WITH ph AS (
                SELECT lpad(CAST(doc_id AS VARCHAR), 6, '0') AS image_id,
                       ('0x' || substr(md5(CAST(doc_id // 2 AS VARCHAR)),
                                       1, 16))::UBIGINT AS phash
                FROM documents
            )
            SELECT a.image_id AS id_a, b.image_id AS id_b,
                   bit_count(xor(a.phash, b.phash)) AS hamming
            FROM ph a JOIN ph b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 6
            ORDER BY id_a, id_b
        """,
        # dims re-derived from the generation rule (datagen/images.py:
        # w = 32+(i%4)*16, h = 24+(i%3)*16); thresholds generated from
        # the SAME ladder constants as the Spark plan
        "image_aspect_bucket": f"""
            SELECT 'img' || i::VARCHAR AS image_id,
                   CASE WHEN i % 10 = 9 THEN 'jpeg' ELSE 'png' END AS fmt,
                   (32 + (i % 4) * 16)::INT AS w,
                   (24 + (i % 3) * 16)::INT AS h,
                   {_aspect_sql_case('32 + (i % 4) * 16',
                                     '24 + (i % 3) * 16')} AS bucket
            FROM range(500) t(i)
            ORDER BY image_id
        """,
        # keep/drop predicted from the flat_every=7 plant rule: solid
        # images have zero contrast/entropy, every other image in this
        # corpus is half-noise (contrast ~40, entropy ~7.9)
        "image_quality_filter": """
            SELECT 'img' || i::VARCHAR AS image_id,
                   CASE WHEN i % 10 = 9 THEN 'jpeg' ELSE 'png' END AS fmt,
                   (i % 7 <> 6) AS keep
            FROM range(400) t(i)
            ORDER BY image_id
        """,
        # dims + flags predicted from the bomb_every=9 plant: img(i) for
        # i%9=8 is a 1024x768 solid PNG (oversize at 0.25 MP AND >50
        # decoded px/byte); every other image is 32..80 x 24..56
        "image_bomb_guard": """
            SELECT 'img' || i::VARCHAR AS image_id,
                   CASE WHEN i % 9 = 8 THEN 1024
                        ELSE 32 + (i % 4) * 16 END AS w,
                   CASE WHEN i % 9 = 8 THEN 768
                        ELSE 24 + (i % 3) * 16 END AS h,
                   (i % 9 = 8) AS oversize,
                   (i % 9 = 8) AS ratio_bomb,
                   (i % 9 <> 8) AS keep
            FROM range(400) t(i)
            ORDER BY image_id
        """,
        # groups predicted from the dup_every=7 plant: img(i) for i%7=6
        # is byte-identical to img(i-1); every other payload is unique
        # (PCG64-seeded noise per content index)
        "image_exact_dedup": """
            SELECT 'img' || i::VARCHAR AS image_id,
                   CASE
                     WHEN i % 7 = 6 THEN
                       least('img' || (i - 1)::VARCHAR, 'img' || i::VARCHAR)
                     WHEN i % 7 = 5 AND i + 1 < 400 THEN
                       least('img' || i::VARCHAR, 'img' || (i + 1)::VARCHAR)
                     ELSE 'img' || i::VARCHAR
                   END AS group_rep,
                   (CASE WHEN i % 7 = 6 OR (i % 7 = 5 AND i + 1 < 400)
                         THEN 2 ELSE 1 END)::INT AS group_size
            FROM range(400) t(i)
            ORDER BY image_id
        """,
        # pyramid levels from the dims rule: content index c (dup rows
        # copy i-1), w = 32 + c%4*16, h = 24 + c%3*16, three levels
        # f in (1,2,4) divide both dims, mean preservation exact-to-
        # rounding so mean_ok is TRUE on every row
        "image_pyramid": """
            WITH rows AS (
                SELECT i, CASE WHEN i % 7 = 6 THEN i - 1 ELSE i END AS c
                FROM range(300) t(i)
            )
            SELECT 'img' || i::VARCHAR AS image_id,
                   f::INT AS level,
                   ((32 + (c % 4) * 16) // f)::INT AS w,
                   ((24 + (c % 3) * 16) // f)::INT AS h,
                   TRUE AS mean_ok
            FROM rows, (VALUES (1), (2), (4)) lv(f)
            ORDER BY image_id, level
        """,
        # the ingest cycle: j%4 in (0,1,2) duplicates corpus content j
        # (byte copy / cross-codec re-encode / 2x thumbnail), j%4==3
        # is novel
        "image_ingest_dedup": """
            SELECT 'new' || j::VARCHAR AS image_id,
                   (j % 4 < 3) AS is_dup,
                   CASE WHEN j % 4 < 3 THEN 'img' || j::VARCHAR
                   END AS dup_of
            FROM range(120) t(j)
            ORDER BY image_id
        """,
        # boilerplate iff the row carries the planted 'thumb' caption:
        # content index c (dup rows copy i-1) with c%5==4; dup pairs
        # share non-thumb captions at count 2 < threshold 3
        "caption_boilerplate": """
            WITH rows AS (
                SELECT i, CASE WHEN i % 7 = 6 THEN i - 1 ELSE i END AS c
                FROM range(500) t(i)
            )
            SELECT 'img' || i::VARCHAR AS image_id,
                   (c % 5 = 4) AS boilerplate
            FROM rows
            ORDER BY image_id
        """,
        # tar roundtrip: the invariant is total — every image id comes
        # back byte-identical from its shard
        "webdataset_roundtrip": """
            SELECT 'img' || i::VARCHAR AS image_id,
                   TRUE AS img_ok,
                   TRUE AS caption_ok
            FROM range(300) t(i)
            ORDER BY image_id
        """,
        # the contamination plant rule, stated arithmetically: content
        # index c (dup rows i%7==6 copy i-1) leaks iff c%25==24; PNG
        # rows (c%10!=9, jpeg_every=10) match the benchmark PNG bytes
        # exactly, JPEG rows only perceptually (caption+phash path)
        "image_decontaminate": """
            WITH rows AS (
                SELECT i, CASE WHEN i % 7 = 6 THEN i - 1 ELSE i END AS c
                FROM range(400) t(i)
            )
            SELECT 'img' || i::VARCHAR AS image_id,
                   'bench' || c::VARCHAR AS bench_id,
                   CASE WHEN c % 10 = 9 THEN 'phash' ELSE 'exact'
                   END AS method
            FROM rows
            WHERE c % 25 = 24
            ORDER BY image_id
        """,
        # identical plant arithmetic + identical regexes (the pattern
        # constants in operators/textops.py are the single definition);
        # counts are taken on the pre-redaction text on both sides
        "pii_redact": f"""
            WITH planted AS (
                SELECT doc_id, text
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' contact u' || doc_id::VARCHAR
                               || '@example.org' ELSE '' END
                  || CASE WHEN doc_id % 4 = 1
                          THEN ' call 555-010-'
                               || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                          ELSE '' END
                  || CASE WHEN doc_id % 5 = 2
                          THEN ' from 10.' || (doc_id % 200)::VARCHAR
                               || '.0.' || (doc_id % 250)::VARCHAR
                          ELSE '' END AS text
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{_PII_EMAIL}', '<EMAIL>', 'g'),
                       '{_PII_IP}', '<IP>', 'g'),
                       '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text,
                   len(regexp_extract_all(text, '{_PII_EMAIL}'))::INT
                       AS n_emails,
                   len(regexp_extract_all(text, '{_PII_PHONE}'))::INT
                       AS n_phones,
                   len(regexp_extract_all(text, '{_PII_IP}'))::INT AS n_ips
            FROM planted
            ORDER BY doc_id
        """,
        # semantic mirror of the line-dedup contract (explode lines,
        # count distinct docs per line, strip lines in >=2 docs), NOT
        # the plant rule — organic cross-doc duplicates must match too
        "line_dedup": """
            WITH two_line AS (
                SELECT doc_id,
                       array_to_string(
                           list_slice(string_split(text, ' '), 1, 6), ' '
                       ) AS l0,
                       CASE WHEN doc_id % 5 = 0
                            THEN 'subscribe to our newsletter for updates'
                            ELSE array_to_string(
                                list_slice(string_split(text, ' '), 7, 12),
                                ' ')
                       END AS l1
                FROM documents
            ),
            lines AS (
                SELECT doc_id, 0 AS line_no, l0 AS line FROM two_line
                UNION ALL
                SELECT doc_id, 1 AS line_no, l1 AS line FROM two_line
            ),
            freq AS (
                SELECT line, count(DISTINCT doc_id) AS n_docs
                FROM lines GROUP BY line
            ),
            marked AS (
                SELECT l.doc_id, l.line_no, l.line,
                       (f.n_docs >= 2) AS is_dup
                FROM lines l JOIN freq f USING (line)
            )
            SELECT doc_id,
                   count(*)::INT AS n_lines,
                   sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::INT AS dup_lines,
                   round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::DOUBLE
                         / count(*), 6) AS dup_frac,
                   coalesce(string_agg(CASE WHEN NOT is_dup THEN line END,
                                       chr(10) ORDER BY line_no),
                            '') AS clean_text
            FROM marked
            GROUP BY doc_id
            ORDER BY doc_id
        """,
        # exact Robertson-idf BM25 replay; scores rounded to 4 dp on
        # both sides BEFORE ranking (sum-order double noise ~1e-16),
        # ties broken on doc_id on both sides
        "bm25_topk": """
            WITH words AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            toks AS (SELECT doc_id, unnest(ws) AS term FROM words),
            dl AS (SELECT doc_id, len(ws) AS dl FROM words),
            tf AS (
                SELECT doc_id, term, count(*)::DOUBLE AS tf
                FROM toks
                WHERE term IN ('spark', 'window', 'merge')
                GROUP BY 1, 2
            ),
            stats AS (
                SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                       (SELECT avg(dl) FROM dl) AS avgdl
            ),
            idf AS (
                SELECT term,
                       ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
                FROM (
                    SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                    FROM tf GROUP BY 1
                ), stats
            ),
            scored AS (
                SELECT tf.doc_id,
                       round(sum(idf.idf * (tf.tf * 2.2
                           / (tf.tf + 1.2 * (1 - 0.75
                              + 0.75 * dl.dl / stats.avgdl)))), 4)
                           AS score
                FROM tf
                JOIN idf USING (term)
                JOIN dl USING (doc_id), stats
                GROUP BY 1
            )
            SELECT doc_id, score,
                   row_number() OVER (ORDER BY score DESC, doc_id)
                       AS rank
            FROM scored
            QUALIFY rank <= 10
            ORDER BY rank
        """,
        # BM25F: identical planted-anchor rule, per-field dl/avgdl
        # normalization, shared saturation, Robertson idf over either
        # field; round-4 before ranking on both sides
        "fielded_bm25": """
            WITH words AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            anch AS (
                SELECT (doc_id - doc_id % 5) AS doc_id,
                       list_filter(regexp_split_to_array(
                           CASE doc_id % 4
                                WHEN 0 THEN 'spark window tutorial'
                                WHEN 1 THEN 'merge guide'
                                WHEN 2 THEN 'window'
                                ELSE 'spark spark merge' END,
                           '[^a-z0-9]+'), x -> x <> '') AS ws
                FROM documents
            ),
            tf_b AS (
                SELECT doc_id, term, count(*)::DOUBLE AS tf_b
                FROM (SELECT doc_id, unnest(ws) AS term FROM words)
                WHERE term IN ('spark', 'window', 'merge')
                GROUP BY 1, 2
            ),
            tf_a AS (
                SELECT doc_id, term, count(*)::DOUBLE AS tf_a
                FROM (SELECT doc_id, unnest(ws) AS term FROM anch)
                WHERE term IN ('spark', 'window', 'merge')
                GROUP BY 1, 2
            ),
            tf AS (
                SELECT coalesce(tf_b.doc_id, tf_a.doc_id) AS doc_id,
                       coalesce(tf_b.term, tf_a.term) AS term,
                       coalesce(tf_b, 0) AS tf_b,
                       coalesce(tf_a, 0) AS tf_a
                FROM tf_b FULL OUTER JOIN tf_a
                     USING (doc_id, term)
            ),
            dl AS (
                SELECT w.doc_id, len(w.ws)::DOUBLE AS dl_b,
                       coalesce(a.dl_a, 0)::DOUBLE AS dl_a
                FROM words w
                LEFT JOIN (
                    SELECT doc_id, sum(len(ws)) AS dl_a
                    FROM anch GROUP BY 1
                ) a ON a.doc_id = w.doc_id
            ),
            stats AS (
                SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                       (SELECT avg(dl_b) FROM dl) AS avgdl_b,
                       (SELECT avg(dl_a) FROM dl) AS avgdl_a
            ),
            idf AS (
                SELECT term,
                       ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
                FROM (
                    SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                    FROM tf GROUP BY 1
                ), stats
            ),
            scored AS (
                SELECT tf.doc_id,
                       round(sum(idf.idf * tfc / (1.2 + tfc)), 4)
                           AS score
                FROM (
                    SELECT tf.*,
                           1.0 * tf_b / (1 - 0.75
                               + 0.75 * dl.dl_b / stats.avgdl_b)
                           + 2.0 * tf_a / (CASE WHEN stats.avgdl_a > 0
                               THEN 1 - 0.75
                                    + 0.75 * dl.dl_a / stats.avgdl_a
                               ELSE 1.0 END) AS tfc
                    FROM tf JOIN dl USING (doc_id), stats
                ) tf
                JOIN idf USING (term)
                GROUP BY 1
            )
            SELECT doc_id, score,
                   row_number() OVER (ORDER BY score DESC, doc_id)
                       AS rank
            FROM scored
            QUALIFY rank <= 10
            ORDER BY rank
        """,
        # generation-rule oracle: the Spark side verifies its own JVM
        # projection per row against an independent numpy projection +
        # the fit invariants; every row must check out
        "pca_project": """
            SELECT vec_id, true AS proj_ok, true AS fit_ok
            FROM embeddings
            ORDER BY vec_id
        """,
        # exact replay of the char-trigram LM: identical normalization,
        # add-0.5 smoothing over a 37-char alphabet, natural-log
        # perplexity; ppl rounded to 4 dp on both sides (sum-order
        # double noise ~1e-13)
        "charlm_perplexity": """
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id, substr(t, i, 3) AS g
                FROM norm, unnest(generate_series(1, len(t) - 2)) AS u(i)
                WHERE len(t) >= 3
            ),
            cn AS (
                SELECT g, count(*)::DOUBLE AS cn FROM grams GROUP BY 1
            ),
            cc AS (
                SELECT substr(g, 1, 2) AS ctx, sum(cn) AS cc
                FROM cn GROUP BY 1
            ),
            lp AS (
                SELECT g, ln((cn + 0.5) / (cc + 0.5 * 37)) AS lp
                FROM cn JOIN cc ON substr(cn.g, 1, 2) = cc.ctx
            )
            SELECT doc_id,
                   count(*)::BIGINT AS n_ngrams,
                   round(exp(-avg(lp)), 4) AS ppl
            FROM grams JOIN lp USING (g)
            GROUP BY doc_id
            ORDER BY doc_id
        """,
        # plant-rule oracle (same family as image_exact_dedup): with
        # dup_every=5 img(i) at i%5==4 carries img(i-1)'s full content
        # (pixels, caption, bytes); every other caption is unique, so
        # the joint groups are exactly those pairs. least() because the
        # min-label runs on the STRING ids ('img10' < 'img9')
        "image_caption_joint_dedup": """
            SELECT 'img' || i::VARCHAR AS image_id,
                   CASE
                     WHEN i % 5 = 4 THEN
                       least('img' || (i - 1)::VARCHAR,
                             'img' || i::VARCHAR)
                     WHEN i % 5 = 3 AND i + 1 < 300 THEN
                       least('img' || i::VARCHAR,
                             'img' || (i + 1)::VARCHAR)
                     ELSE 'img' || i::VARCHAR
                   END AS component
            FROM range(300) t(i)
            ORDER BY image_id
        """,
        # identical plant + identical winnowing replay: 60-bit md5
        # window hashes, min-of-8 content-defined selection, <=50-doc
        # frequency cap, fingerprint self-join
        # generation-rule oracle: the planted passage of pair k is
        # 27 + k%6 chars (>= the winnowing guarantee at 20/8) fenced
        # by differing boundary chars, so the exact two-pass verify
        # must emit exactly one row per pair with the planted length —
        # and nothing else (the md5 pads share no 20-char run)
        "substring_dup_verify": """
            SELECT CAST(2 * doc_id AS BIGINT) AS id_a,
                   CAST(2 * doc_id + 1 AS BIGINT) AS id_b,
                   CAST(27 + doc_id % 6 AS INT) AS lcs_len
            FROM documents WHERE doc_id < 40
            ORDER BY id_a, id_b
        """,
        # closed-form removal oracle over the identical md5 plant: the
        # passage survives in doc 2k, vanishes from doc 2k+1 (the text
        # is already normalization-invariant: lowercase alnum only)
        "dup_passage_scrub": """
            WITH d AS (
                SELECT CAST(2 * k + side AS BIGINT) AS doc_id, side,
                       md5(CAST(k + 2000 + 77 * side AS VARCHAR)) AS pad,
                       substr(md5(CAST(k AS VARCHAR))
                              || md5(CAST(k + 1000 AS VARCHAR)),
                              1, CAST(27 + k % 6 AS INT)) AS p,
                       CASE side WHEN 0 THEN 'q' ELSE 'z' END AS f
                FROM (SELECT doc_id AS k FROM documents WHERE doc_id < 40),
                     (SELECT unnest([0, 1]) AS side)
            )
            SELECT doc_id,
                   CASE WHEN side = 1
                        THEN pad || 'zz' || reverse(pad)
                        ELSE pad || 'q' || p || 'q' || reverse(pad)
                   END AS clean_text,
                   CAST(CASE WHEN side = 1 THEN length(p) ELSE 0 END
                        AS INT) AS n_removed
            FROM d ORDER BY doc_id
        """,
        "substring_dup": """
            WITH planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 20 < 2 THEN
                           text || ' ' || concat_ws(' ', t, 'alpha', t,
                               'bravo', t, 'charlie', t, 'delta', t,
                               'echo')
                       ELSE text END AS text
                FROM (SELECT doc_id, text,
                             'k' || lpad((doc_id // 20)::VARCHAR, 6, '0')
                                 AS t
                      FROM documents
                      WHERE doc_id % 100000 < 1000)
            ),
            norm AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
                FROM planted
            ),
            ha AS (
                SELECT doc_id,
                       list_transform(generate_series(1, len(t) - 49),
                           i -> ('0x' || substr(md5(substr(t, i, 50)),
                                                1, 15))::BIGINT) AS h
                FROM norm WHERE len(t) >= 50
            ),
            fps AS (
                SELECT DISTINCT doc_id, fp FROM (
                    SELECT doc_id,
                           unnest(CASE WHEN len(h) >= 8 THEN
                               list_distinct(list_transform(
                                   generate_series(1, len(h) - 7),
                                   j -> list_aggregate(
                                       list_slice(h, j, j + 7), 'min')))
                           ELSE [list_aggregate(h, 'min')] END) AS fp
                    FROM ha)
            ),
            keep AS (
                SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50
            ),
            f2 AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*)::BIGINT AS n_shared
            FROM f2 a JOIN f2 b USING (fp)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
            ORDER BY id_a, id_b
        """,
        # identical md5 feature-bucket hash, add-0.5 smoothing over 4096
        # buckets, per-doc sum of bucket log-ratios (sum-order double
        # noise absorbed by round(4), same as charlm)
        "dsir_weight": """
            WITH toks AS (
                SELECT doc_id, lang = 'en' AS tgt,
                       unnest(list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), x -> x <> '')) AS w
                FROM documents
            ),
            b AS (
                SELECT doc_id, tgt,
                       ('0x' || substr(md5(w), 1, 8))::BIGINT % 4096 AS bkt
                FROM toks
            ),
            raw_c AS (SELECT bkt, count(*) AS cr FROM b GROUP BY 1),
            tgt_c AS (SELECT bkt, count(*) AS ct FROM b WHERE tgt GROUP BY 1),
            tot AS (
                SELECT count(*) AS tr,
                       sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tt
                FROM b
            ),
            lr AS (
                SELECT r.bkt,
                       ln((coalesce(t.ct, 0) + 0.5) / (tot.tt + 0.5 * 4096))
                       - ln((r.cr + 0.5) / (tot.tr + 0.5 * 4096)) AS lr
                FROM raw_c r LEFT JOIN tgt_c t USING (bkt) CROSS JOIN tot
            )
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   round(sum(lr), 4) AS logw
            FROM b JOIN lr USING (bkt)
            GROUP BY doc_id ORDER BY doc_id
        """,
        # brute-force pair rule over the identical (capped) corpus:
        # keep = no lower-id neighbor with cos >= 0.95; dup_of = the
        # smallest such neighbor. Exact cosine verification in the
        # operator makes its output equal this rule wherever cell
        # recall holds — which the gate checks.
        "semantic_dedup": f"""
            WITH flat AS ({cos_flat}),
            fl AS (SELECT * FROM flat WHERE vec_id % 100000 < 1000),
            pl AS (
                SELECT a.vec_id + 100000 AS vec_id, a.i, a.v + 0.18 * b.v AS v
                FROM flat a JOIN flat b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
                WHERE (a.vec_id + 100000) % 100000 < 1000
            ),
            allf AS (SELECT * FROM fl UNION ALL SELECT * FROM pl),
            dots AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       sum(a.v * b.v)
                         / (sqrt(sum(a.v * a.v)) * sqrt(sum(b.v * b.v))) AS sim
                FROM allf a JOIN allf b ON a.i = b.i AND a.vec_id < b.vec_id
                GROUP BY 1, 2
            ),
            dup AS (
                SELECT id_b AS vec_id, min(id_a) AS dup_of
                FROM dots WHERE sim >= 0.95 GROUP BY 1
            ),
            ids AS (SELECT DISTINCT vec_id FROM allf)
            SELECT ids.vec_id, dup.dup_of IS NULL AS keep, dup.dup_of
            FROM ids LEFT JOIN dup USING (vec_id)
            ORDER BY ids.vec_id
        """,
        # ccnet buckets: the charlm oracle's ppl CTEs + quantile_cont
        # thresholds (rounded to 4 dp on both sides) + the same
        # right-closed head/middle/tail CASE
        "ccnet_bucket": """
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id, substr(t, i, 3) AS g
                FROM norm, unnest(generate_series(1, len(t) - 2)) AS u(i)
                WHERE len(t) >= 3
            ),
            cn AS (
                SELECT g, count(*)::DOUBLE AS cn FROM grams GROUP BY 1
            ),
            cc AS (
                SELECT substr(g, 1, 2) AS ctx, sum(cn) AS cc
                FROM cn GROUP BY 1
            ),
            lp AS (
                SELECT g, ln((cn + 0.5) / (cc + 0.5 * 37)) AS lp
                FROM cn JOIN cc ON substr(cn.g, 1, 2) = cc.ctx
            ),
            ppl AS (
                SELECT doc_id, round(exp(-avg(lp)), 4) AS ppl
                FROM grams JOIN lp USING (g) GROUP BY doc_id
            ),
            cuts AS (
                SELECT round(quantile_cont(ppl, 0.3333333333333333), 4) AS t1,
                       round(quantile_cont(ppl, 0.6666666666666666), 4) AS t2
                FROM ppl
            )
            SELECT doc_id, ppl,
                   CASE WHEN ppl <= t1 THEN 'head'
                        WHEN ppl <= t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM ppl CROSS JOIN cuts
            ORDER BY doc_id
        """,
        "image_resize_verify": """
            SELECT 'img' || i::VARCHAR AS image_id, true AS ok
            FROM range(300) t(i)
            ORDER BY image_id
        """,
        # exact top-k with the same (count desc, term asc) tie-break:
        # the engine's pass-2 recount makes its output exact wherever
        # the MG candidate guarantee holds
        "heavy_hitters": """
            WITH toks AS (
                SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), x -> x <> '')) AS term
                FROM documents
            ),
            c AS (SELECT term, count(*)::BIGINT AS n FROM toks GROUP BY 1)
            SELECT term, n,
                   row_number() OVER (ORDER BY n DESC, term ASC) AS rank
            FROM c ORDER BY n DESC, term ASC LIMIT 20
        """,
        # the language_id + quality_score + repetition_stats fragments
        # fused, plus the identical keep CASE and thresholds
        "quality_gate": f"""
            WITH base AS (
                SELECT doc_id, text, {wordset} AS w,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), x -> x <> '') AS wl
                FROM documents
            ),
            m AS (
                SELECT doc_id,
                    len(list_intersect(w, ['the','and','of','to','in','is','that','with'])) AS se,
                    len(list_intersect(w, ['der','die','und','das','nicht','ist','ein','mit'])) AS sd,
                    len(list_intersect(w, ['le','la','et','les','des','est','une','dans'])) AS sf,
                    CAST(length(text) AS DOUBLE) AS n_chars,
                    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
                    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
                    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) AS n_upper,
                    len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS n_words,
                    list_transform(generate_series(1, len(wl) - 2),
                        i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS tg
                FROM base
            ),
            s AS (
                SELECT doc_id,
                    CASE WHEN greatest(se, sd, sf) <= 0 THEN 'und'
                         WHEN se = greatest(se, sd, sf) THEN 'en'
                         WHEN sd = greatest(se, sd, sf) THEN 'de'
                         ELSE 'fr' END AS pred_lang,
                    round(least(n_words / 100.0, 1.0) * 0.4
                        + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0 END) * 0.3
                        + (1 - least((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END) * 5, 1.0)) * 0.2
                        + (1 - CASE WHEN n_alpha > 0 THEN n_upper / n_alpha ELSE 0 END) * 0.1, 6) AS quality,
                    round(CASE WHEN len(tg) > 0 THEN
                        1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
                        ELSE 0.0 END, 6) AS dup_trigram_frac,
                    n_words
                FROM m
            )
            SELECT doc_id, pred_lang, quality, dup_trigram_frac, n_words,
                   (pred_lang IN ('en') AND quality >= 0.75
                    AND dup_trigram_frac <= 0.2
                    AND n_words >= 20 AND n_words <= 100000) AS keep
            FROM s ORDER BY doc_id
        """,
        # outlier replay: identical plant (x3-scaled copies), centroid,
        # distance, and z-normalizer, all rounded at the same points
        "embedding_outliers": f"""
            WITH flat AS ({cos_flat}),
            allf AS (
                SELECT vec_id, i, v FROM flat
                UNION ALL
                SELECT vec_id + 100000, i, 3.0 * v
                FROM flat WHERE vec_id % 100 = 7
            ),
            cent AS (SELECT i, round(avg(v), 6) AS c FROM allf GROUP BY i),
            d AS (
                SELECT vec_id,
                       round(sqrt(sum((v - c) * (v - c))), 6) AS dist
                FROM allf JOIN cent USING (i) GROUP BY vec_id
            ),
            st AS (
                SELECT round(avg(dist), 6) AS mu,
                       round(stddev_pop(dist), 6) AS sd
                FROM d
            )
            SELECT vec_id, dist,
                   round((dist - mu) / sd, 4) AS z,
                   round((dist - mu) / sd, 4) >= 2.0 AS outlier
            FROM d CROSS JOIN st ORDER BY vec_id
        """,
        # host-graph rollup replay: identical plant + two-level agg
        "host_graph": """
            WITH links AS (
                SELECT 'h' || (l_suppkey % 50)::VARCHAR || '.example'
                           AS src_host,
                       CASE WHEN l_quantity < 10
                            THEN 'h' || (l_suppkey % 50)::VARCHAR
                                 || '.example'
                            ELSE 'site' || (l_partkey % 7)::VARCHAR
                                 || '.example' END AS dst_host,
                       'http://h' || (l_suppkey % 50)::VARCHAR
                           || '.example/o/' || l_orderkey::VARCHAR
                           AS page
                FROM lineitem
            ),
            pp AS (
                SELECT src_host, dst_host, page, count(*) AS n
                FROM links GROUP BY 1, 2, 3
            )
            SELECT src_host, dst_host,
                   sum(n)::BIGINT AS n_links,
                   count(*)::BIGINT AS n_src_pages,
                   src_host = dst_host AS internal
            FROM pp GROUP BY src_host, dst_host
            ORDER BY src_host, dst_host
        """,
        # paired-cosine alignment replay: index-join dot/norms over the
        # unnested arrays, same rounding and threshold
        "clip_align_filter": f"""
            WITH flat AS ({cos_flat}),
            d AS (
                SELECT a.vec_id,
                       sum(a.v * b.v) AS dot,
                       sqrt(sum(a.v * a.v)) AS na,
                       sqrt(sum(b.v * b.v)) AS nb
                FROM flat a
                JOIN flat b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
                GROUP BY a.vec_id
            )
            SELECT vec_id,
                   round(dot / (na * nb), 6) AS align_cos,
                   round(dot / (na * nb), 6) >= 0.2 AS keep
            FROM d ORDER BY vec_id
        """,
        # z-order layout replay: the identical bit-interleave expansion
        # over the same (x, y) projection, tile = top 8 Morton bits
        # budget apportionment: identical integer largest-remainder
        # rule — floor share by div, spare slots to the largest
        # remainders with key tie-break
        "crawl_budget_alloc": """
            WITH hosts AS (
                SELECT 'h' || (user_id % 53) AS key,
                       CAST(count(*) AS BIGINT) AS weight
                FROM events GROUP BY 1
            ),
            tot AS (SELECT sum(weight) AS s FROM hosts),
            base AS (
                SELECT key, weight,
                       (10000 * weight) // s AS b,
                       (10000 * weight) % s AS rem
                FROM hosts, tot
            ),
            spare AS (SELECT 10000 - sum(b) AS r FROM base)
            SELECT key, weight,
                   CAST(b + CASE WHEN row_number() OVER (
                            ORDER BY rem DESC, key ASC) <= r
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc
            FROM base, spare
            ORDER BY key
        """,
        # compaction bin-pack: replay the next-fit rule — exclusive
        # prefix sum of small-file sizes per partition // 128 MB target
        "compaction_plan": """
            WITH ledger AS (
                SELECT 'p' || (event_id % 7) AS part,
                       event_id AS file,
                       CASE WHEN event_id % 9 = 0 THEN 300
                            ELSE 10 + (event_id % 83) END AS size
                FROM events
            )
            SELECT part, file, CAST(size AS BIGINT) AS size,
                   CAST(COALESCE(SUM(size) OVER (
                            PARTITION BY part ORDER BY file
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0)
                        // 128 AS INT) AS group_no
            FROM ledger WHERE size < 128
            UNION ALL
            SELECT part, file, CAST(size AS BIGINT) AS size,
                   CAST(-1 AS INT) AS group_no
            FROM ledger WHERE size >= 128
            ORDER BY part, file
        """,
        "zorder_layout": f"""
            WITH pts AS (
                SELECT user_id % 4096 AS x, event_id % 4096 AS y
                FROM events
            ),
            keyed AS (
                SELECT x, y, ({zkey}) >> 16 AS tile FROM pts
            )
            SELECT tile, count(*)::BIGINT AS n_rows,
                   min(x) AS min_x, max(x) AS max_x,
                   min(y) AS min_y, max(y) AS max_y,
                   max(x) - min(x) AS x_span,
                   max(y) - min(y) AS y_span
            FROM keyed GROUP BY tile ORDER BY tile
        """,
        # chunking replay: identical stride/tail-guard start rule;
        # chunk_id recovered arithmetically from the start (s = 1 +
        # chunk_id * step)
        "chunk_split": """
            SELECT doc_id,
                   (s - 1) // 400 AS chunk_id,
                   (s - 1)::BIGINT AS char_start,
                   length(substr(text, s::INT, 500))::BIGINT AS n_chars,
                   substr(text, s::INT, 500) AS chunk
            FROM documents,
                 unnest(generate_series(1,
                     greatest(length(text) - 100, 1), 400)) u(s)
            WHERE length(text) > 0
            ORDER BY doc_id, chunk_id
        """,
        # count-min sketch replay: the identical 4x1024 md5-hashed cell
        # matrix rebuilt in SQL, min-over-rows point queries, exact
        # counts for the differential columns
        "cms_freq_est": f"""
            WITH toks AS (
                SELECT unnest(list_filter(regexp_split_to_array(
                    lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
                FROM documents
            ),
            cells AS (
                SELECT r, ('0x' || substr(md5(r::VARCHAR || ':' || tok),
                        1, 8))::BIGINT % 1024 AS cell
                FROM toks, range(4) t(r)
            ),
            sketch AS (
                SELECT r, cell, count(*) AS n FROM cells GROUP BY 1, 2
            ),
            q AS (
                SELECT unnest({_CMS_TERMS!r}) AS term
            ),
            qc AS (
                SELECT term, r,
                       ('0x' || substr(md5(r::VARCHAR || ':' || term),
                        1, 8))::BIGINT % 1024 AS cell
                FROM q, range(4) t(r)
            ),
            est AS (
                SELECT term, min(coalesce(n, 0))::BIGINT AS cms_est
                FROM qc LEFT JOIN sketch USING (r, cell) GROUP BY term
            ),
            tn AS (
                SELECT tok AS term, count(*) AS true_n FROM toks
                WHERE tok IN (SELECT term FROM q) GROUP BY 1
            )
            SELECT term, coalesce(true_n, 0)::BIGINT AS true_n, cms_est,
                   cms_est >= coalesce(true_n, 0) AS never_under
            FROM est LEFT JOIN tn USING (term) ORDER BY term
        """,
        # fastText inference replay: identical unigram+bigram features,
        # md5 bucket hash, md5-derived weight vector, mean-pool sigmoid
        "fasttext_quality": """
            WITH wl AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), x -> x <> '') AS w
                FROM documents
            ),
            feats AS (
                SELECT doc_id,
                       unnest(list_concat(w, CASE WHEN len(w) >= 2
                           THEN list_transform(generate_series(1, len(w)-1),
                                i -> w[i] || '_' || w[i+1])
                           ELSE []::VARCHAR[] END)) AS f
                FROM wl
            ),
            b AS (
                SELECT doc_id,
                       ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bkt
                FROM feats
            ),
            wt AS (
                SELECT i AS bkt,
                       (('0x' || substr(md5(i::VARCHAR), 1, 8))::BIGINT
                        % 2001 - 1000) / 1000.0 AS w
                FROM range(4096) t(i)
            ),
            s AS (
                SELECT doc_id, count(*)::BIGINT AS n_feats,
                       round(1.0 / (1.0 + exp(-avg(w))), 4) AS score
                FROM b JOIN wt USING (bkt)
                GROUP BY doc_id
            )
            SELECT doc_id, n_feats, score, score >= 0.5 AS label
            FROM s ORDER BY doc_id
        """,
        # generation rule: jpeg rows (i%10==9) are encoded at exactly
        # q98 by this repo's codec, so the DQT-matching estimator must
        # return (98, exact); png rows carry no DQT
        "jpeg_quality_est": """
            SELECT 'img' || i::VARCHAR AS image_id,
                   CASE WHEN i % 10 = 9 THEN 'jpeg' END AS fmt,
                   (CASE WHEN i % 10 = 9 THEN 98 END)::INT AS q_est,
                   CASE WHEN i % 10 = 9 THEN true END AS exact
            FROM range(400) t(i)
            ORDER BY image_id
        """,
    }
    # the survivor-set query extends the component walk with keep +
    # group_size: same recursive-CTE edge set, plus the size aggregate
    out["dedup_keep"] = f"""
        WITH RECURSIVE ws AS (
            SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9]+'), x -> x <> '') AS w
            FROM ({doubled})
            WHERE doc_id % 100000 < 1000
        ),
        sh AS (
            SELECT doc_id,
                   CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                        ELSE list_distinct(list_transform(
                             generate_series(1, len(w) - 2),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                   END AS s
            FROM ws
        ),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             AND len(a.s) * 5 >= len(b.s) * 4
             AND len(b.s) * 5 >= len(a.s) * 4
            WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.8
        ),
        edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION ALL
            SELECT id_b AS s, id_a AS d FROM pairs
        ),
        reach(a, b) AS (
            SELECT doc_id, doc_id FROM ws
            UNION
            SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
        ),
        comp AS (
            SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
        ),
        sz AS (
            SELECT component, count(*)::BIGINT AS group_size
            FROM comp GROUP BY 1
        )
        SELECT comp.doc_id, comp.component,
               comp.component = comp.doc_id AS keep, sz.group_size
        FROM comp JOIN sz USING (component)
        ORDER BY comp.doc_id
    """
    # the star-variant components query answers the identical question
    # (same pair graph, same min-label contract) via a different
    # algorithm — one oracle text, two engine implementations under it
    out["near_dup_components_star"] = out["near_dup_components"]
    from smart_crawler_spark.operators.textops import (
        ENC_CTRL_RE as _ENC_CTRL,
        ENC_MOJIBAKE_RE as _ENC_MOJI,
        ENC_REPLACEMENT_CHAR as _ENC_REPL,
    )

    out["encoding_quality"] = f"""
        WITH d1 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN replace(text, 'e', 'Ã©')
                        ELSE text END AS t
            FROM documents
        ),
        d2 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN t || chr(7) ELSE t END AS t
            FROM d1
        ),
        d3 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 11 = 0 THEN t || '{_ENC_REPL}'
                        ELSE t END AS t
            FROM d2
        ),
        c AS (
            SELECT doc_id,
                   CAST(length(t) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(t, '{_ENC_REPL}')) AS INT)
                       AS n_replacement,
                   CAST(len(regexp_extract_all(t, '{_ENC_CTRL}')) AS INT)
                       AS n_ctrl,
                   CAST(len(regexp_extract_all(t, '{_ENC_MOJI}')) AS INT)
                       AS n_mojibake
            FROM d3
        )
        SELECT doc_id, n_chars, n_replacement, n_ctrl, n_mojibake,
               (n_replacement = 0 AND n_ctrl = 0
                AND n_mojibake * 100 <= n_chars) AS keep
        FROM c ORDER BY doc_id
    """
    out["char_entropy"] = """
        WITH norm AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
            FROM documents
        ),
        ch AS (
            SELECT doc_id, substr(t, i, 1) AS c
            FROM norm, unnest(generate_series(1, len(t))) AS u(i)
            WHERE len(t) > 0
        ),
        cc AS (
            SELECT doc_id, c, count(*)::DOUBLE AS cnt
            FROM ch GROUP BY 1, 2
        ),
        s AS (
            SELECT doc_id, sum(cnt) AS n, count(*) AS d,
                   sum(cnt * ln(cnt)) AS s
            FROM cc GROUP BY 1
        )
        SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
               CAST(d AS INT) AS n_distinct,
               round(ln(n) - s / n, 6) AS entropy
        FROM s ORDER BY doc_id
    """
    out["truncation_pairs"] = r"""
        WITH d AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 300000, substr(text, 1, 150)
            FROM documents WHERE doc_id % 4 = 0
        ),
        n AS (
            SELECT doc_id AS id,
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
            FROM d
        ),
        b AS (
            SELECT id, t, CAST(length(t) AS BIGINT) AS len,
                   md5(substr(t, 1, 64)) AS pk
            FROM n WHERE length(t) >= 64
        ),
        ok AS (SELECT pk FROM b GROUP BY pk HAVING count(*) <= 50)
        SELECT a.id AS id_short, c.id AS id_long,
               a.len AS short_len, c.len AS long_len
        FROM b a JOIN b c
          ON a.pk = c.pk AND a.len < c.len
         AND substr(c.t, 1, CAST(a.len AS INT)) = a.t
        WHERE a.pk IN (SELECT pk FROM ok)
        ORDER BY id_short, id_long
    """
    out["group_split"] = f"""
        WITH comp AS ({out["near_dup_components"]})
        SELECT doc_id, component,
               CASE WHEN ('0x' || substr(md5(CAST(component AS VARCHAR)),
                          1, 8))::BIGINT % 10 < 8 THEN 'train'
                    WHEN ('0x' || substr(md5(CAST(component AS VARCHAR)),
                          1, 8))::BIGINT % 10 = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM comp ORDER BY doc_id
    """
    out["trustrank"] = _ppr_oracle_sql(iters=8, damping=0.85, seed_mod=97)
    out["truncated_recall"] = f"""
        WITH flat AS ({cos_flat}),
        fdots AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   sum(q.v * c.v)
                     / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS sim
            FROM flat q JOIN flat c ON q.i = c.i
            WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
            GROUP BY 1, 2
        ),
        franked AS (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(sim, 6) DESC, neighbor_id ASC
                   ) AS rk
            FROM fdots
        ),
        tdots AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   sum(q.v * c.v)
                     / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS sim
            FROM flat q JOIN flat c ON q.i = c.i
            WHERE q.i <= 16 AND c.i <= 16
              AND q.vec_id < 5 AND q.vec_id <> c.vec_id
            GROUP BY 1, 2
        ),
        tranked AS (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(sim, 6) DESC, neighbor_id ASC
                   ) AS rk
            FROM tdots
        ),
        ov AS (
            SELECT f.query_id, CAST(count(*) AS INT) AS n_overlap
            FROM (SELECT query_id, neighbor_id FROM franked WHERE rk <= 5) f
            JOIN (SELECT query_id, neighbor_id FROM tranked WHERE rk <= 5) t
              ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
            GROUP BY 1
        )
        SELECT q.query_id,
               coalesce(ov.n_overlap, 0) AS n_overlap,
               round(coalesce(ov.n_overlap, 0) / 5, 6) AS recall
        FROM (SELECT DISTINCT query_id FROM franked) q
        LEFT JOIN ov ON ov.query_id = q.query_id
        ORDER BY q.query_id
    """
    out["tfidf_cosine"] = f"""
        WITH d AS (
            SELECT doc_id, text FROM ({doubled})
            WHERE doc_id % 100000 < 300
        ),
        toks AS (
            SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                   lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
            FROM d
        ),
        tf AS MATERIALIZED (
            SELECT doc_id, w, count(*)::DOUBLE AS tf
            FROM toks GROUP BY 1, 2
        ),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
        dft AS MATERIALIZED (
            SELECT w, ln((SELECT n FROM nn) / count(*)) AS idf
            FROM tf GROUP BY w HAVING count(*) <= 100
        ),
        wt AS MATERIALIZED (
            SELECT tf.w, doc_id AS id, tf * idf AS wgt
            FROM tf JOIN dft ON tf.w = dft.w
        ),
        norms AS MATERIALIZED (
            SELECT id, sqrt(sum(wgt * wgt)) AS nrm FROM wt GROUP BY id
        ),
        dots AS (
            SELECT a.id AS id_a, b.id AS id_b, sum(a.wgt * b.wgt) AS dot
            FROM wt a JOIN wt b ON a.w = b.w AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(dot / (na.nrm * nb.nrm), 6) AS cosine
        FROM dots
        JOIN norms na ON na.id = id_a
        JOIN norms nb ON nb.id = id_b
        WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.5
        ORDER BY id_a, id_b
    """
    out["cross_format_phash"] = """
        SELECT 'img' || i AS image_id, true AS within
        FROM range(500) t(i) WHERE i % 10 <> 9
        ORDER BY image_id
    """
    out["rolling_distinct_users"] = """
        WITH p AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        e AS (
            SELECT user_id,
                   CAST(unnest(generate_series(
                       CAST(d AS TIMESTAMP),
                       CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
                       INTERVAL 1 DAY)) AS DATE) AS day
            FROM p
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
        FROM e GROUP BY 1 ORDER BY day
    """
    out["merge_upsert"] = """
        WITH b AS (
            SELECT o_orderkey AS key, o_orderstatus AS status,
                   round(o_totalprice, 2) AS price
            FROM orders
        ),
        ch AS (
            SELECT key, 'D' AS op, NULL::VARCHAR AS status,
                   NULL::DOUBLE AS price FROM b WHERE key % 7 = 0
            UNION ALL
            SELECT key, 'U', 'X', round(price + 100.0, 2)
            FROM b WHERE key % 7 = 1
            UNION ALL
            SELECT key + 10000000, 'I', 'N', round(price * 2.0, 2)
            FROM b WHERE key % 7 = 2
            UNION ALL
            SELECT key, 'I', 'Z', 0.0 FROM b WHERE key % 7 = 3
            UNION ALL
            SELECT key + 20000000, 'D', NULL, NULL FROM b WHERE key % 7 = 4
        )
        SELECT coalesce(b.key, ch.key) AS key,
               CASE WHEN (b.key IS NOT NULL AND ch.op = 'U')
                      OR (b.key IS NULL AND ch.op = 'I')
                    THEN ch.status ELSE b.status END AS status,
               CASE WHEN (b.key IS NOT NULL AND ch.op = 'U')
                      OR (b.key IS NULL AND ch.op = 'I')
                    THEN ch.price ELSE b.price END AS price
        FROM b FULL OUTER JOIN ch ON b.key = ch.key
        WHERE (b.key IS NOT NULL AND (ch.key IS NULL OR ch.op <> 'D'))
           OR (b.key IS NULL AND ch.op = 'I')
        ORDER BY key
    """
    out["event_funnel"] = """
        WITH s1 AS MATERIALIZED (
            SELECT user_id, min(ts) AS prev,
                   min(ts) + INTERVAL 604800 SECOND AS lim
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS MATERIALIZED (
            SELECT e.user_id, min(e.ts) AS prev, min(p.lim) AS lim
            FROM events e JOIN s1 p ON p.user_id = e.user_id
            WHERE e.event_type = 'click'
              AND e.ts > p.prev AND e.ts <= p.lim
            GROUP BY e.user_id
        ),
        s3 AS MATERIALIZED (
            SELECT e.user_id, min(e.ts) AS prev
            FROM events e JOIN s2 p ON p.user_id = e.user_id
            WHERE e.event_type = 'purchase'
              AND e.ts > p.prev AND e.ts <= p.lim
            GROUP BY e.user_id
        ),
        n AS (
            SELECT (SELECT count(*) FROM s1) AS n1,
                   (SELECT count(*) FROM s2) AS n2,
                   (SELECT count(*) FROM s3) AS n3
        )
        SELECT step, event_type, n_users, conversion FROM (
            SELECT 1 AS step, 'view' AS event_type,
                   CAST(n1 AS BIGINT) AS n_users,
                   round(n1 / CAST(n1 AS DOUBLE), 6) AS conversion FROM n
            UNION ALL
            SELECT 2, 'click', CAST(n2 AS BIGINT),
                   round(n2 / CAST(n1 AS DOUBLE), 6) FROM n
            UNION ALL
            SELECT 3, 'purchase', CAST(n3 AS BIGINT),
                   round(n3 / CAST(n1 AS DOUBLE), 6) FROM n
        ) ORDER BY step
    """
    out["retention_cohorts"] = """
        WITH f AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        act AS (
            SELECT DISTINCT e.user_id, f.cohort_day,
                   CAST(ts AS DATE) - f.cohort_day AS day_offset
            FROM events e JOIN f ON f.user_id = e.user_id
        )
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
               day_offset, CAST(count(*) AS BIGINT) AS n_users
        FROM act GROUP BY 1, 2 ORDER BY cohort_day, day_offset
    """
    out["length_histogram"] = r"""
        WITH w AS (
            SELECT CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x <> '')) AS DOUBLE) AS nw
            FROM documents
        ),
        b AS (
            SELECT CAST(floor((nw - 0.0) / 20.0) AS BIGINT) AS bin_id,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM w GROUP BY 1
        )
        SELECT bin_id, 0.0 + bin_id * 20.0 AS lo,
               0.0 + (bin_id + 1) * 20.0 AS hi, n_rows
        FROM b ORDER BY bin_id
    """
    out["corpus_summary"] = f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                        AS DOUBLE) AS n_alpha,
                   CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                        AS DOUBLE) AS n_punct,
                   CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                        AS DOUBLE) AS n_upper,
                   CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '')) AS DOUBLE) AS n_words,
                   {wordset} AS w
            FROM documents
        ),
        s AS (
            SELECT CAST(n_words AS BIGINT) AS nw,
                   round(least(n_words / 100.0, 1.0) * 0.4
                         + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars
                                 ELSE 0 END) * 0.3
                         + (1 - least((CASE WHEN n_chars > 0
                                            THEN n_punct / n_chars
                                            ELSE 0 END) * 5, 1.0)) * 0.2
                         + (1 - CASE WHEN n_alpha > 0 THEN n_upper / n_alpha
                                     ELSE 0 END) * 0.1, 6) AS q,
                   len(list_intersect(w, ['the','and','of','to','in','is','that','with'])) AS score_en,
                   len(list_intersect(w, ['der','die','und','das','nicht','ist','ein','mit'])) AS score_de,
                   len(list_intersect(w, ['le','la','et','les','des','est','une','dans'])) AS score_fr
            FROM m
        ),
        lng AS (
            SELECT nw, q,
                   CASE WHEN greatest(score_en, score_de, score_fr) <= 0
                            THEN 'und'
                        WHEN score_en = greatest(score_en, score_de, score_fr)
                            THEN 'en'
                        WHEN score_de = greatest(score_en, score_de, score_fr)
                            THEN 'de'
                        ELSE 'fr' END AS lang
            FROM s
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nw) AS BIGINT) AS total_words,
               round(avg(q), 6) AS avg_quality,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_en,
               CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_de,
               CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fr,
               CAST(sum(CASE WHEN lang = 'und' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_und
        FROM lng
    """
    out["html_tag_stats"] = """
        WITH w AS (
            SELECT doc_id,
                   '<html><head><title>d</title><script src="a.js">'
                   || '</script></head><body><p>' || text || '</p>'
                   || repeat('<a href="/x">l</a>',
                             CAST(doc_id % 3 AS INT))
                   || repeat('<img src="/i.png">',
                             CAST(doc_id % 2 AS INT))
                   || '</body></html>' AS h
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(h, '<[^>]+>')) AS INT) AS n_tags,
               CAST(len(regexp_extract_all(h, '<a[ >]')) AS INT) AS n_links,
               CAST(len(regexp_extract_all(h, '<script[ >]')) AS INT)
                   AS n_scripts,
               CAST(len(regexp_extract_all(h, '<img[ >]')) AS INT) AS n_imgs,
               CAST(length(h) AS BIGINT) AS n_chars,
               CAST(length(regexp_replace(h, '<[^>]+>', '', 'g')) AS BIGINT)
                   AS text_chars,
               round(length(regexp_replace(h, '<[^>]+>', '', 'g'))
                     / length(h), 6) AS text_ratio
        FROM w ORDER BY doc_id
    """
    out["redirect_chains"] = """
        WITH RECURSIVE ids AS (
            SELECT DISTINCT event_id AS i FROM events WHERE event_id < 3000
        ),
        e AS (
            SELECT 'http://site.test/p' || i AS src,
                   'http://site.test/p' || (i + 1) AS dst
            FROM ids WHERE i % 13 <> 12
            UNION ALL
            SELECT 'http://site.test/p' || x, 'http://site.test/p' || y
            FROM (VALUES (90000, 90001), (90001, 90002),
                         (90002, 90003), (90003, 90001)) t(x, y)
        ),
        walk(orig, cur, hops) AS (
            SELECT src, dst, 1 FROM e
            UNION ALL
            SELECT w.orig, e2.dst, w.hops + 1
            FROM walk w JOIN e e2 ON e2.src = w.cur
            WHERE w.hops < 64
        ),
        term AS (
            SELECT orig, cur AS final_url, hops FROM walk
            WHERE cur NOT IN (SELECT src FROM e)
        )
        SELECT e.src AS url, t.final_url AS final_url,
               CAST(coalesce(t.hops, -1) AS BIGINT) AS hops,
               t.final_url IS NULL AS is_cycle
        FROM e LEFT JOIN term t ON t.orig = e.src
        ORDER BY url
    """
    # k-core: 8 statically unrolled peel rounds, same order of
    # operations as operators/graphops.py kcore (degree -> HAVING >= k
    # -> both-endpoint semi-filter)
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # round references the previous one three times, so 8 rounds would
    # expand to ~3^8 copies of the base scan (observed as an fd-limit
    # blowup); materializing keeps the chain linear.
    _kc = [
        """
        pairs AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        e0 AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
               UNION SELECT s, c FROM pairs)
        """
    ]
    for _r in range(8):
        _kc.append(f"""
        a{_r + 1} AS MATERIALIZED (SELECT src FROM e{_r}
                      GROUP BY src HAVING count(*) >= 3),
        e{_r + 1} AS MATERIALIZED (SELECT src, dst FROM e{_r}
                      WHERE src IN (SELECT src FROM a{_r + 1})
                        AND dst IN (SELECT src FROM a{_r + 1}))
        """)
    out["kcore"] = (
        "WITH " + ",".join(_kc)
        + """
        SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM e8 GROUP BY src ORDER BY node
    """
    )
    out["hard_negatives"] = f"""
        WITH flat AS ({cos_flat}),
        pl AS (
            SELECT a.vec_id + 100000 AS vec_id, a.i, a.v + 0.18 * b.v AS v
            FROM flat a JOIN flat b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
        ),
        allf AS (SELECT * FROM flat UNION ALL SELECT * FROM pl),
        dots AS (
            SELECT q.vec_id AS query_id, c.vec_id AS negative_id,
                   sum(q.v * c.v)
                     / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS sim
            FROM flat q JOIN allf c ON q.i = c.i
            WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query_id, negative_id, round(sim, 6) AS cos_sim,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(sim, 6) DESC, negative_id ASC
                   ) AS rank
            FROM dots WHERE round(sim, 6) < 0.95
        )
        SELECT query_id, negative_id, cos_sim, rank
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """
    # the mjpeg leg samples the same (video, frame) grid and must hit
    # the same PSNR invariant — one oracle text, two container codecs
    out["video_frame_sample_mjpeg"] = out["video_frame_sample"]
    # target-mix resampling: same counts -> cap -> acceptance -> draw
    # arithmetic, same operation order, so the kept set is hash-exact
    out["domain_mix"] = """
        WITH t(lang, w) AS (VALUES
            (CAST('en' AS VARCHAR), CAST(0.40 AS DOUBLE)),
            ('de', 0.15), ('es', 0.15), ('fr', 0.15), ('zh', 0.15)),
        c AS (
            SELECT lang, CAST(count(*) AS DOUBLE) AS n
            FROM documents GROUP BY lang
        ),
        cap AS (SELECT min(n / w) AS cap FROM c JOIN t USING (lang)),
        p AS (
            SELECT c.lang, t.w * cap.cap / c.n AS p
            FROM c JOIN t USING (lang) CROSS JOIN cap
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d JOIN p USING (lang)
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                  ::BIGINT / 4294967296.0 < p.p
        ORDER BY d.doc_id
    """
    # temperature mixing: identical powered-count normalizer, cap and
    # draw, expression order mirrored for IEEE equality
    out["temperature_mix"] = """
        WITH c AS (
            SELECT lang, CAST(count(*) AS DOUBLE) AS n
            FROM documents GROUP BY lang
        ),
        z AS (SELECT sum(pow(n, 0.5)) AS z FROM c),
        t AS (
            SELECT lang, n, pow(n, 0.5) / z.z AS t
            FROM c CROSS JOIN z
        ),
        cap AS (SELECT min(n / t) AS cap FROM t),
        p AS (
            SELECT lang, t * cap.cap / n AS p FROM t CROSS JOIN cap
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d JOIN p USING (lang)
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                  ::BIGINT / 4294967296.0 < p.p
        ORDER BY d.doc_id
    """
    # the shuffle oracle IS the spec: one global row_number over the
    # md5 draw — the engine must reproduce it via its distributed
    # two-phase prefix sum
    out["shuffle_shard"] = """
        WITH u AS (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT AS h
            FROM documents
        )
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY h, doc_id) - 1
                    AS BIGINT) AS pos,
               CAST((row_number() OVER (ORDER BY h, doc_id) - 1) % 8
                    AS INTEGER) AS shard
        FROM u ORDER BY doc_id
    """
    # quality-aware survivors: dedup_keep's component walk + the
    # quality_score expression + an arg-max window per component
    out["dedup_keep_best"] = f"""
        WITH RECURSIVE ws AS (
            SELECT doc_id, text,
                   list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9]+'), x -> x <> '') AS w
            FROM ({doubled})
            WHERE doc_id % 100000 < 1000
        ),
        q AS (
            SELECT doc_id,
                   round(least(CAST(len(list_filter(
                             regexp_split_to_array(text, '\\s+'),
                             x -> x <> '')) AS DOUBLE) / 100.0, 1.0) * 0.4
                     + (CASE WHEN length(text) > 0 THEN
                            CAST(length(regexp_replace(text, '[^A-Za-z]',
                                 '', 'g')) AS DOUBLE) / length(text)
                        ELSE 0 END) * 0.3
                     + (1 - least((CASE WHEN length(text) > 0 THEN
                            CAST(length(regexp_replace(text, '[^.,;:!?]',
                                 '', 'g')) AS DOUBLE) / length(text)
                        ELSE 0 END) * 5, 1.0)) * 0.2
                     + (1 - CASE WHEN length(regexp_replace(text,
                            '[^A-Za-z]', '', 'g')) > 0 THEN
                            CAST(length(regexp_replace(text, '[^A-Z]',
                                 '', 'g')) AS DOUBLE)
                            / length(regexp_replace(text, '[^A-Za-z]',
                                 '', 'g'))
                        ELSE 0 END) * 0.1, 6) AS quality
            FROM ws
        ),
        sh AS (
            SELECT doc_id,
                   CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                        ELSE list_distinct(list_transform(
                             generate_series(1, len(w) - 2),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                   END AS s
            FROM ws
        ),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             AND len(a.s) * 5 >= len(b.s) * 4
             AND len(b.s) * 5 >= len(a.s) * 4
            WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.8
        ),
        edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION ALL
            SELECT id_b AS s, id_a AS d FROM pairs
        ),
        reach(a, b) AS (
            SELECT doc_id, doc_id FROM ws
            UNION
            SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
        ),
        comp AS (
            SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
        ),
        ranked AS (
            SELECT comp.component, comp.doc_id,
                   row_number() OVER (PARTITION BY comp.component
                       ORDER BY q.quality DESC, comp.doc_id ASC) AS rn
            FROM comp JOIN q USING (doc_id)
        ),
        k AS (SELECT component, doc_id AS kept_id FROM ranked WHERE rn = 1),
        sz AS (
            SELECT component, count(*)::BIGINT AS group_size
            FROM comp GROUP BY 1
        )
        SELECT comp.doc_id, comp.component, q.quality, k.kept_id,
               comp.doc_id = k.kept_id AS keep, sz.group_size
        FROM comp
        JOIN q USING (doc_id)
        JOIN k USING (component)
        JOIN sz USING (component)
        ORDER BY comp.doc_id
    """
    # curation gate: dims from the generation rule (header sniff must
    # recover them exactly), caption decision from the
    # short_caption_every=5 plant (planted caption = 1 word, every
    # organic caption = 'Image {i}:' + 6 words = 8 tokens)
    out["caption_filter"] = """
        SELECT 'img' || i::VARCHAR AS image_id,
               CASE WHEN i % 10 = 9 THEN 'jpeg' ELSE 'png' END AS fmt,
               (32 + (i % 4) * 16)::INT AS w,
               (24 + (i % 3) * 16)::INT AS h,
               (CASE WHEN i % 5 = 4 THEN 1 ELSE 8 END)::INT AS n_words,
               (i % 4 <> 0 AND i % 3 <> 0 AND i % 5 <> 4) AS keep
        FROM range(500) t(i)
        ORDER BY image_id
    """
    # k-per-group sample: the oracle ranks over the identical md5 draw
    out["group_sample"] = """
        WITH u AS (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                       ::BIGINT AS h
            FROM orders
        ),
        r AS (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY h, o_orderkey) AS INTEGER) AS rk
            FROM u
        )
        SELECT o_orderkey, o_custkey, o_totalprice, rk
        FROM r WHERE rk <= 2
        ORDER BY o_orderkey
    """
    # deny-list rule as a correlated EXISTS: host == d or host ends
    # with '.d'; a blocked subdomain must NOT block its parent
    out["url_blocklist"] = """
        WITH u AS (
            SELECT event_id,
                   CASE WHEN event_id % 4 = 0 THEN 'ads.example'
                        WHEN event_id % 4 = 1 THEN 'a.b.ads.example'
                        WHEN event_id % 4 = 2 THEN 'example'
                        ELSE 'ok.site' END || '.test' AS host
            FROM events WHERE event_id < 3000
        ),
        b(dom) AS (VALUES ('ads.example.test'), ('bad.test'),
                          ('spam.example.test'))
        SELECT event_id,
               'http://' || host || '/p/' || event_id::VARCHAR AS url,
               EXISTS (SELECT 1 FROM b WHERE u.host = b.dom
                       OR u.host LIKE '%.' || b.dom) AS blocked
        FROM u ORDER BY event_id
    """
    # identical strip/decode/collapse chain replayed on the identical
    # deterministic HTML shell; '&amp;' decodes LAST on both sides
    out["html_text_extract"] = r"""
        WITH w AS (
            SELECT doc_id,
                   '<html><head><title>Doc ' || doc_id::VARCHAR ||
                   '</title><style>p{color:red}</style></head><body>' ||
                   '<script>var a = 1 &amp;&amp; 2;</script><p>' || text ||
                   '</p><!-- cmt --><div>footer &amp; nav</div>' ||
                   '</body></html>' AS html
            FROM documents
        )
        SELECT doc_id,
               trim(regexp_replace(
                 replace(replace(replace(replace(replace(replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(html,
                       '(?is)<script\b.*?</script>', ' ', 'g'),
                       '(?is)<style\b.*?</style>', ' ', 'g'),
                       '(?is)<head\b.*?</head>', ' ', 'g'),
                       '(?s)<!--.*?-->', ' ', 'g'),
                       '(?s)<[^>]+>', ' ', 'g'),
                   '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                   '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                 '\s+', ' ', 'g')) AS clean_text
        FROM w ORDER BY doc_id
    """
    # the ledger merge is arrival-order-independent (monotone min +
    # partition-idempotent sums), so the final streaming state follows
    # from the generator plant rules alone: content ci = i-1 on dup
    # rows (i%6=5), gate pass = dims + caption rules on ci
    out["streaming_image_ingest"] = """
        WITH c AS (
            SELECT DISTINCT CASE WHEN i % 6 = 5 THEN i - 1 ELSE i END AS ci
            FROM range(240) t(i)
        )
        SELECT 'img' || ci::VARCHAR AS image_id,
               (CASE WHEN ci % 6 = 4 AND ci + 1 < 240
                     THEN 2 ELSE 1 END)::BIGINT AS n_copies
        FROM c
        WHERE ci % 4 <> 0 AND ci % 3 <> 0 AND ci % 5 <> 4
        ORDER BY ci
    """
    # the WARC corpus is a pure index rule: shard s*25+j carries url /
    # status / payload derived from the global index, and ASCII
    # payloads make n_bytes == length(); md5(text) == md5(utf8 bytes)
    # cdx index: surt derived from the construction rule
    # ('http://h{k}.test/p/{i}' -> 'test,h{k})/p/{i}'), slice_ok true
    # everywhere (the random-access invariant)
    out["cdx_index"] = """
        SELECT 'test,h' || (i % 7)::VARCHAR || ')/p/' || i::VARCHAR
                   AS surt,
               's' || (i // 25)::VARCHAR AS shard_id,
               (i % 25)::INT AS rec_idx,
               'http://h' || (i % 7)::VARCHAR || '.test/p/'
                   || i::VARCHAR AS url,
               'response' AS warc_type,
               (CASE WHEN i % 11 = 3 THEN 404 ELSE 200 END)::INT
                   AS status,
               true AS slice_ok
        FROM range(1000) t(i)
        ORDER BY surt, shard_id, rec_idx
    """
    out["warc_source"] = """
        SELECT 's' || (i // 25)::VARCHAR AS shard_id,
               (i % 25)::INT AS rec_idx,
               'http://h' || (i % 7)::VARCHAR || '.test/p/'
                   || i::VARCHAR AS url,
               'response' AS warc_type,
               (CASE WHEN i % 11 = 3 THEN 404 ELSE 200 END)::INT
                   AS status,
               length(repeat('page ' || i::VARCHAR || ' body ',
                             i % 4 + 1))::BIGINT AS n_bytes,
               md5(repeat('page ' || i::VARCHAR || ' body ',
                          i % 4 + 1)) AS payload_md5
        FROM range(1000) t(i)
        ORDER BY shard_id, rec_idx
    """
    # revisit resolution restated arithmetically: index i is a revisit
    # iff i%5==4 and its block anchor b=i-4 is a 200 (b%11!=3); the
    # resolved payload is the ANCHOR's payload rule, and the original
    # locator is the anchor's (shard, rec) position — cross-shard when
    # i%25 < 4
    out["warc_revisit_resolve"] = """
        WITH r AS (
            SELECT i,
                   (i % 5 = 4 AND (i - 4) % 11 != 3) AS is_rev,
                   CASE WHEN i % 5 = 4 AND (i - 4) % 11 != 3
                        THEN i - 4 ELSE i END AS src
            FROM range(1000) t(i)
        )
        SELECT 's' || (i // 25)::VARCHAR AS shard_id,
               (i % 25)::INT AS rec_idx,
               'http://h' || (src % 7)::VARCHAR || '.test/p/'
                   || src::VARCHAR AS url,
               CASE WHEN is_rev THEN 'revisit' ELSE 'response'
                   END AS warc_type,
               (CASE WHEN is_rev THEN 200
                     WHEN i % 11 = 3 THEN 404 ELSE 200 END)::INT
                   AS status,
               md5(repeat('page ' || src::VARCHAR || ' body ',
                          src % 4 + 1)) AS resolved_md5,
               length(repeat('page ' || src::VARCHAR || ' body ',
                             src % 4 + 1))::BIGINT AS resolved_bytes,
               CASE WHEN is_rev THEN 's' || (src // 25)::VARCHAR
                   END AS orig_shard_id,
               (CASE WHEN is_rev THEN src % 25 END)::INT AS orig_rec_idx,
               TRUE AS resolved
        FROM r
        ORDER BY shard_id, rec_idx
    """
    # SURT from the construction rule, never by re-parsing: reversed
    # labels + ':port' + ')' + path + '?query', fragment gone, host
    # case folded
    out["surt_index"] = """
        WITH u AS (
            SELECT event_id,
                   'H' || (user_id % 5)::VARCHAR AS hraw,
                   'h' || (user_id % 5)::VARCHAR AS hlab,
                   (event_id % 3 = 0) AS has_sub,
                   (event_id % 2 = 0) AS has_port,
                   CASE WHEN event_id % 11 = 0 THEN '/'
                        ELSE '/p/' || event_id::VARCHAR END AS path,
                   CASE WHEN event_id % 7 = 0
                        THEN '?k=' || (event_id % 3)::VARCHAR
                        ELSE '' END AS q,
                   CASE WHEN event_id % 5 = 0 THEN '#f' ELSE '' END AS frag
            FROM events WHERE event_id < 2500
        )
        SELECT event_id,
               'http://' || hraw
                   || CASE WHEN has_sub THEN '.sub' ELSE '' END || '.test'
                   || CASE WHEN has_port THEN ':8081' ELSE '' END
                   || path || q || frag AS url,
               'test,' || CASE WHEN has_sub THEN 'sub,' ELSE '' END || hlab
                   || CASE WHEN has_port THEN ':8081' ELSE '' END
                   || ')' || path || q AS surt
        FROM u ORDER BY event_id
    """
    # same tokenization, counts, deterministic rank and left join; the
    # exploded output keeps token order without a corpus sort
    out["vocab_encode"] = """
        WITH w AS (
            SELECT doc_id,
                   generate_subscripts(toks, 1) - 1 AS pos,
                   unnest(toks) AS word
            FROM (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), x -> x <> '') AS toks
                FROM documents
            )
        ),
        vocab AS (
            SELECT word,
                   (row_number() OVER (ORDER BY count(*) DESC, word ASC)
                       - 1)::INT AS token_id
            FROM w GROUP BY word
            ORDER BY count(*) DESC, word ASC
            LIMIT 25
        )
        SELECT w.doc_id, w.pos::INT AS pos, w.word,
               coalesce(v.token_id, -1)::INT AS token_id
        FROM w LEFT JOIN vocab v USING (word)
        ORDER BY w.doc_id, w.pos
    """
    out["pagerank"] = _pagerank_oracle_sql(iters=8, damping=0.85)
    # identical deterministic graph; recursive-CTE BFS to min pair
    # distances, then the cumulative pair count per hop (self-pairs at
    # d=0 included, the standard neighborhood-function convention)
    out["neighborhood_function"] = """
        WITH RECURSIVE n AS (
            SELECT DISTINCT event_id % 60 AS u FROM events
        ),
        e AS (
            SELECT u, (u + 1) % 60 AS v FROM n
            UNION
            SELECT u, (u * 7) % 60 AS v FROM n WHERE u % 3 = 0
            UNION
            SELECT u, (u + 13) % 60 AS v FROM n WHERE u % 5 = 0
        ),
        e2 AS (SELECT u, v FROM e WHERE u <> v),
        reach(u, v, d) AS (
            SELECT u, u, 0 FROM n
            UNION
            SELECT r.u, e2.v, r.d + 1
            FROM reach r JOIN e2 ON e2.u = r.v
            WHERE r.d < 6
        ),
        md AS (SELECT u, v, min(d) AS d FROM reach GROUP BY u, v),
        hops AS (SELECT unnest(range(0, 7)) AS hop)
        SELECT CAST(hop AS INT) AS hop,
               (SELECT count(*) FROM md WHERE md.d <= hops.hop)
                   AS n_pairs
        FROM hops ORDER BY hop
    """
    # same recursive BFS curve (to hop 10) + the ANF interpolation:
    # d_eff = (h-1) + (target - N(h-1)) / (N(h) - N(h-1))
    out["effective_diameter"] = """
        WITH RECURSIVE n AS (
            SELECT DISTINCT event_id % 60 AS u FROM events
        ),
        e AS (
            SELECT u, (u + 1) % 60 AS v FROM n
            UNION
            SELECT u, (u * 7) % 60 AS v FROM n WHERE u % 3 = 0
            UNION
            SELECT u, (u + 13) % 60 AS v FROM n WHERE u % 5 = 0
        ),
        e2 AS (SELECT u, v FROM e WHERE u <> v),
        reach(u, v, d) AS (
            SELECT u, u, 0 FROM n
            UNION
            SELECT r.u, e2.v, r.d + 1
            FROM reach r JOIN e2 ON e2.u = r.v
            WHERE r.d < 10
        ),
        md AS (SELECT u, v, min(d) AS d FROM reach GROUP BY u, v),
        hops AS (SELECT unnest(range(0, 11)) AS hop),
        curve AS (
            SELECT CAST(hop AS INT) AS hop,
                   (SELECT count(*) FROM md WHERE md.d <= hops.hop)
                       AS n_pairs
            FROM hops
        ),
        t AS (SELECT 0.9 * max(n_pairs) AS target FROM curve),
        x AS (
            SELECT hop, n_pairs,
                   lag(n_pairs) OVER (ORDER BY hop) AS prev
            FROM curve
        )
        SELECT 0.9 AS q,
               round(CASE WHEN hop = 0 THEN 0.0
                     ELSE (hop - 1)
                          + ((SELECT target FROM t) - prev)
                            / (n_pairs - prev) END, 4) AS eff_diameter
        FROM x
        WHERE n_pairs >= (SELECT target FROM t)
        ORDER BY hop LIMIT 1
    """
    out["label_propagation"] = _lpa_oracle_sql(iters=4)
    out["anchor_text"] = """
        WITH links AS (
            SELECT 'http://h' || (l_suppkey % 50)
                   || '.example/o/' || l_orderkey AS src,
                   'http://site.example/part/' || l_partkey AS dst,
                   (['buy now', 'details', 'best price', 'spec sheet',
                     'similar parts'])[
                       (CAST(l_quantity AS BIGINT) % 5 + 1)::INT
                   ] AS anchor
            FROM lineitem
        ), pa AS (
            SELECT dst, anchor, count(*) AS cnt
            FROM links GROUP BY dst, anchor
        ), top AS (
            SELECT dst, anchor AS top_anchor, cnt AS top_anchor_cnt
            FROM (
                SELECT dst, anchor, cnt,
                       row_number() OVER (
                           PARTITION BY dst
                           ORDER BY cnt DESC, anchor ASC
                       ) AS rn
                FROM pa
            ) WHERE rn = 1
        ), tot AS (
            SELECT dst, count(*) AS inlinks,
                   count(DISTINCT anchor) AS distinct_anchors,
                   count(DISTINCT regexp_extract(
                       src, '^[a-z][a-z0-9+.-]*://([^/]+)', 1
                   )) AS src_hosts
            FROM links GROUP BY dst
        )
        SELECT t.dst AS dst, t.inlinks, t.distinct_anchors, t.src_hosts,
               p.top_anchor, p.top_anchor_cnt
        FROM tot t JOIN top p ON p.dst = t.dst
        ORDER BY t.dst
    """
    # naive u<v<w triple enumeration of the same co-purchase graph —
    # affordable in DuckDB at gate scale; Spark runs the degree-ordered
    # orientation instead (same triangles, each found exactly once)
    out["triangle_count"] = """
        WITH lp AS (
            SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
        ), e AS (
            SELECT DISTINCT a.pk AS u, b.pk AS v
            FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
        ), deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e
            ) GROUP BY node
        ), tri AS (
            SELECT x.u AS a, x.v AS b, y.v AS c
            FROM e x
            JOIN e y ON x.u = y.u AND x.v < y.v
            JOIN e z ON z.u = x.v AND z.v = y.v
        ), pn AS (
            SELECT node, count(*) AS tri FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            ) GROUP BY node
        )
        SELECT d.node AS node, d.deg AS deg,
               coalesce(p.tri, 0) AS tri,
               CASE WHEN d.deg > 1 THEN
                   round(2.0 * coalesce(p.tri, 0)
                         / (d.deg * (d.deg - 1.0)), 6)
               ELSE 0.0 END AS lcc
        FROM deg d LEFT JOIN pn p ON p.node = d.node
        ORDER BY d.node
    """
    out["hits"] = _hits_oracle_sql(iters=6)
    # identical window + aggregate + Poisson staleness arithmetic; the
    # floats divide and exp() over the same IEEE doubles on both sides
    out["revisit_priority"] = """
        WITH v AS (
            SELECT 'http://site.test/u/' || user_id AS url,
                   epoch_us(ts) AS ts_us,
                   CAST(floor(value / 10.0) AS BIGINT) AS fp,
                   event_id
            FROM events
        ),
        ch AS (
            SELECT url, ts_us, fp,
                   lag(fp) OVER (PARTITION BY url
                                 ORDER BY ts_us, event_id) AS prev
            FROM v
        ),
        agg AS (
            SELECT url, count(*) AS visits,
                   CAST(sum(CASE WHEN prev IS NOT NULL AND fp <> prev
                            THEN 1 ELSE 0 END) AS BIGINT) AS changes,
                   min(ts_us) AS f, max(ts_us) AS l
            FROM ch GROUP BY url
        ),
        nw AS (SELECT max(l) AS now_us FROM agg)
        SELECT url, visits, changes,
               round(CASE WHEN l > f
                     THEN changes / ((l - f) / 3600000000.0::DOUBLE)
                     ELSE 0.0::DOUBLE END, 6) AS lambda_h,
               round(1.0::DOUBLE - exp(
                   -(CASE WHEN l > f
                     THEN changes / ((l - f) / 3600000000.0::DOUBLE)
                     ELSE 0.0::DOUBLE END)
                   * (((SELECT now_us FROM nw) - l)
                      / 3600000000.0::DOUBLE)), 6) AS priority
        FROM agg ORDER BY url
    """
    # identical frontier synthesis + Poisson staleness + per-host
    # prioritized rank + trust-scaled budget clamp; Spark runs the
    # production prioritized_pick path, DuckDB states the rule
    out["crawl_site_prioritized"] = """
        WITH f AS (
            SELECT 'http://h' || (user_id % 7) || '.test/p/' || event_id
                       AS url,
                   'h' || (user_id % 7) || '.test' AS host,
                   CAST(event_id % 3 AS INT) AS class_depth,
                   'c' || (event_id % 3) AS class_name,
                   CAST(NULL AS VARCHAR) AS form_params,
                   round(1.0::DOUBLE - exp(
                       -(CASE WHEN (event_id % 5) > 0
                         THEN (event_id % 3)
                              / CAST(event_id % 5 AS DOUBLE)
                         ELSE 0.0::DOUBLE END)
                       * (12 - ((event_id % 2 + 1) + (event_id % 5)))
                   ), 6) AS staleness
            FROM events WHERE event_id < 4000
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY host
                ORDER BY staleness DESC, class_depth, class_name, url,
                         form_params ASC NULLS FIRST
            ) AS rank
            FROM f
        ),
        t AS (
            SELECT 'h' || k || '.test' AS host,
                   GREATEST(1, CAST(floor(5 * (k / 5.0)) AS INT)) AS tb
            FROM range(7) AS r2(k)
        )
        SELECT r.host, r.url, r.rank, r.staleness
        FROM r LEFT JOIN t ON t.host = r.host
        WHERE r.rank <= 5 AND r.rank <= COALESCE(t.tb, 5)
        ORDER BY r.host, r.rank, r.url
    """
    # the sitemap documents are rule-generated from part, so the oracle
    # states the rule; the Spark side must round-trip it through XML
    # assembly + the fragment parser (entities, CDATA, optional fields)
    out["sitemap_parse"] = """
        WITH p AS (
            SELECT p_partkey AS k, p_partkey % 37 AS site FROM part
        ),
        urls AS (
            SELECT site, 'url' AS kind,
                   'http://s' || site || '.example/part/' || k ||
                       CASE WHEN k % 5 = 0 THEN '?a=1&b=2' ELSE '' END
                       AS loc,
                   CASE WHEN k % 3 <> 2 THEN '2024-01-' ||
                        lpad(CAST((k % 28) + 1 AS VARCHAR), 2, '0')
                   END AS lastmod,
                   CASE k % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                        ELSE 'monthly' END AS changefreq,
                   CASE WHEN k % 4 = 0
                        THEN ('0.' || (k % 10))::DOUBLE END AS priority
            FROM p
        ),
        idx AS (
            SELECT CAST(-1 AS BIGINT) AS site, 'sitemap' AS kind,
                   'http://idx.example/sm/' || s || '.xml' AS loc,
                   '2024-02-01' AS lastmod,
                   CAST(NULL AS VARCHAR) AS changefreq,
                   CAST(NULL AS DOUBLE) AS priority
            FROM (SELECT DISTINCT site AS s FROM p)
        )
        SELECT * FROM (
            SELECT * FROM urls UNION ALL SELECT * FROM idx
        ) ORDER BY kind, loc
    """
    # same two-stage shape: word counts, then a lateral pair explode
    # over the distinct-word table (words shorter than 2 chars produce
    # an empty series on both engines)
    out["bpe_pair_stats"] = """
        WITH w AS (
            SELECT unnest(list_filter(
                regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS word
            FROM documents
        ),
        wf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
        pairs AS (
            SELECT f.freq,
                   substr(f.word, i, 1) || ' ' || substr(f.word, i + 1, 1)
                       AS pair
            FROM wf f,
                 unnest(generate_series(1, length(f.word) - 1)) AS t(i)
        )
        SELECT pair, CAST(sum(freq) AS BIGINT) AS weight
        FROM pairs GROUP BY pair
        ORDER BY weight DESC, pair ASC LIMIT 50
    """
    # ground truth for the fuzzy join is DuckDB's own levenshtein over
    # all id-ordered pairs; |len diff| <= 1 is a SOUND prefilter for
    # edit distance 1 (a deletion changes length by exactly 1), so the
    # oracle never misses a pair the blocking could find
    out["fuzzy_join_keys"] = """
        WITH base AS (
            SELECT p_partkey AS id,
                   p_name || '#' || CAST(p_partkey AS VARCHAR) AS key
            FROM part WHERE p_partkey % 4 = 0
        ),
        typos AS (
            SELECT id + 10000000 AS id,
                   substr(key, 1, CAST(id % 5 AS INTEGER))
                       || substr(key, CAST(id % 5 AS INTEGER) + 2) AS key
            FROM base WHERE id % 20 = 0
        ),
        allk AS (SELECT * FROM base UNION ALL SELECT * FROM typos)
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
        FROM allk a JOIN allk b
          ON a.id < b.id
         AND abs(length(a.key) - length(b.key)) <= 1
        WHERE levenshtein(a.key, b.key) <= 1
        ORDER BY id_a, id_b
    """
    out["pmi_collocations"] = """
        WITH words AS (
            SELECT list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS ws
            FROM documents
        ),
        uni AS (
            SELECT tok, count(*) AS c
            FROM (SELECT unnest(ws) AS tok FROM words) GROUP BY tok
        ),
        bg AS (
            SELECT ws[i] AS w1, ws[i + 1] AS w2
            FROM words, unnest(generate_series(1, len(ws) - 1)) AS t(i)
            WHERE len(ws) >= 2
        ),
        pcnt AS (
            SELECT w1, w2, count(*) AS pair_count FROM bg GROUP BY w1, w2
        ),
        tot AS (
            SELECT (SELECT sum(c)::DOUBLE FROM uni) AS n,
                   (SELECT sum(pair_count)::DOUBLE FROM pcnt) AS b
        )
        SELECT p.w1, p.w2, CAST(p.pair_count AS BIGINT) AS pair_count,
               round(ln((p.pair_count::DOUBLE * tot.n * tot.n)
                        / (tot.b * cx.c::DOUBLE * cy.c::DOUBLE)), 6)
                   AS pmi
        FROM pcnt p
        JOIN uni cx ON cx.tok = p.w1
        JOIN uni cy ON cy.tok = p.w2, tot
        WHERE p.pair_count >= 5
        ORDER BY p.w1, p.w2
    """
    out["rrf_fusion"] = f"""
        WITH wrds AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS ws
            FROM documents
        ),
        toks AS (SELECT doc_id, unnest(ws) AS term FROM wrds),
        dl AS (SELECT doc_id, len(ws) AS dl FROM wrds),
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM toks
            WHERE term IN ('spark', 'window', 'merge')
            GROUP BY 1, 2
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT avg(dl) FROM dl) AS avgdl
        ),
        idf AS (
            SELECT term, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
            FROM (
                SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                FROM tf GROUP BY 1
            ), stats
        ),
        bm AS (
            SELECT tf.doc_id,
                   round(sum(idf.idf * (tf.tf * 2.2
                       / (tf.tf + 1.2 * (1 - 0.75
                          + 0.75 * dl.dl / stats.avgdl)))), 4) AS score
            FROM tf
            JOIN idf USING (term)
            JOIN dl USING (doc_id), stats
            GROUP BY 1
        ),
        lex AS (
            SELECT doc_id AS id,
                   row_number() OVER (ORDER BY score DESC, doc_id)
                       AS rank_a
            FROM bm QUALIFY rank_a <= 100
        ),
        flat AS ({cos_flat}),
        dots AS (
            SELECT c.vec_id AS id,
                   sum(q.v * c.v)
                     / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS sim
            FROM flat q JOIN flat c ON q.i = c.i
            WHERE q.vec_id = 0 AND c.vec_id <> 0
            GROUP BY 1
        ),
        vec AS (
            SELECT id,
                   row_number() OVER (
                       ORDER BY round(sim, 6) DESC, id ASC) AS rank_b
            FROM dots QUALIFY rank_b <= 100
        ),
        fused AS (
            SELECT coalesce(lex.id, vec.id) AS id,
                   coalesce(rank_a, 0) AS rank_a,
                   coalesce(rank_b, 0) AS rank_b,
                   round(coalesce(1.0 / (60.0 + rank_a), 0.0)
                         + coalesce(1.0 / (60.0 + rank_b), 0.0), 6)
                       AS rrf_score
            FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
        )
        SELECT id, rank_a, rank_b, rrf_score,
               row_number() OVER (ORDER BY rrf_score DESC, id ASC)
                   AS fused_rank
        FROM fused
        QUALIFY fused_rank <= 20
        ORDER BY fused_rank
    """
    # (score, label) source shared by quality_auc / score_calibration:
    # the quality_score formula (proven CTE above) vs lang = 'en'
    ql = r"""
        qm AS (
            SELECT doc_id, lang,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
                   CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
                   CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) AS n_upper,
                   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                        x -> x <> '')) AS DOUBLE) AS n_words
            FROM documents
        ),
        ql AS (
            SELECT round(least(n_words / 100.0, 1.0) * 0.4
                     + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0 END) * 0.3
                     + (1 - least((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END) * 5, 1.0)) * 0.2
                     + (1 - CASE WHEN n_alpha > 0 THEN n_upper / n_alpha ELSE 0 END) * 0.1, 6) AS s,
                   (lang = 'en') AS y
            FROM qm
        )
    """
    out["quality_auc"] = f"""
        WITH {ql},
        g AS (
            SELECT s, sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
                   sum(CASE WHEN y THEN 0 ELSE 1 END) AS neg
            FROM ql GROUP BY s
        ),
        c AS (
            SELECT pos, neg,
                   coalesce(sum(neg) OVER (
                       ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS neg_lt
            FROM g
        ),
        t AS (
            SELECT sum(2 * neg_lt * pos + pos * neg) AS num2,
                   sum(pos) AS np, sum(neg) AS nn
            FROM c
        )
        SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               round(CAST(num2 AS DOUBLE)
                     / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)),
                     6) AS auc
        FROM t
    """
    out["score_calibration"] = f"""
        WITH {ql},
        b AS (
            SELECT least(CAST(floor(s * 10) AS INTEGER), 9) AS bin,
                   CAST(round(s * 1000000) AS BIGINT) AS micro,
                   CASE WHEN y THEN 1 ELSE 0 END AS yy
            FROM ql
        ),
        a AS (
            SELECT bin, count(*) AS n, sum(micro) AS sm, sum(yy) AS np
            FROM b GROUP BY bin
        )
        SELECT bin, CAST(n AS BIGINT) AS n,
               round(CAST(sm AS DOUBLE) / (1000000.0 * n), 6) AS mean_score,
               round(CAST(np AS DOUBLE) / n, 6) AS pos_rate,
               round(abs(round(CAST(sm AS DOUBLE) / (1000000.0 * n), 6)
                         - round(CAST(np AS DOUBLE) / n, 6)), 6) AS abs_gap
        FROM a ORDER BY bin
    """
    out["bm25_ndcg"] = """
        WITH wrds AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS ws
            FROM documents
        ),
        toks AS (SELECT doc_id, unnest(ws) AS term FROM wrds),
        dl AS (SELECT doc_id, len(ws) AS dl FROM wrds),
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM toks
            WHERE term IN ('spark', 'window', 'merge')
            GROUP BY 1, 2
        ),
        rel AS (
            SELECT doc_id, least(CAST(sum(tf) AS BIGINT), 16) AS rel
            FROM tf GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT avg(dl) FROM dl) AS avgdl
        ),
        idf AS (
            SELECT term, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
            FROM (
                SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                FROM tf GROUP BY 1
            ), stats
        ),
        bm AS (
            SELECT tf.doc_id,
                   round(sum(idf.idf * (tf.tf * 2.2
                       / (tf.tf + 1.2 * (1 - 0.75
                          + 0.75 * dl.dl / stats.avgdl)))), 4) AS score
            FROM tf
            JOIN idf USING (term)
            JOIN dl USING (doc_id), stats
            GROUP BY 1
        ),
        ranked AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id)
                       AS rank
            FROM bm QUALIFY rank <= 10
        ),
        dcg AS (
            SELECT round(sum(
                       (power(2.0, CAST(coalesce(rel.rel, 0) AS DOUBLE))
                        - 1.0)
                       / log2(CAST(ranked.rank AS DOUBLE) + 1.0)), 6)
                       AS dcg
            FROM ranked LEFT JOIN rel USING (doc_id)
        ),
        ideal AS (
            SELECT rel,
                   row_number() OVER (ORDER BY rel DESC, doc_id ASC)
                       AS rank
            FROM rel QUALIFY rank <= 10
        ),
        idcg AS (
            SELECT round(sum((power(2.0, CAST(rel AS DOUBLE)) - 1.0)
                             / log2(CAST(rank AS DOUBLE) + 1.0)), 6)
                       AS idcg
            FROM ideal
        )
        SELECT CAST(10 AS INTEGER) AS k, dcg.dcg, idcg.idcg,
               round(dcg.dcg / idcg.idcg, 6) AS ndcg
        FROM dcg, idcg
    """
    out["gate_agreement_kappa"] = f"""
        WITH {ql},
        c AS (
            SELECT sum(CASE WHEN s >= 0.77 AND y THEN 1 ELSE 0 END) AS tt,
                   sum(CASE WHEN s >= 0.77 AND NOT y THEN 1 ELSE 0 END) AS tf,
                   sum(CASE WHEN s < 0.77 AND y THEN 1 ELSE 0 END) AS ft,
                   sum(CASE WHEN s < 0.77 AND NOT y THEN 1 ELSE 0 END) AS ff
            FROM ql
        )
        SELECT CAST(tt + tf + ft + ff AS BIGINT) AS n,
               round(CAST(tt + ff AS DOUBLE)
                     / (tt + tf + ft + ff), 6) AS p_o,
               round(CAST((tt + tf) * (tt + ft)
                          + (ft + ff) * (tf + ff) AS DOUBLE)
                     / (CAST(tt + tf + ft + ff AS DOUBLE)
                        * CAST(tt + tf + ft + ff AS DOUBLE)), 6) AS p_e,
               round((CAST(tt + ff AS DOUBLE) / (tt + tf + ft + ff)
                      - CAST((tt + tf) * (tt + ft)
                             + (ft + ff) * (tf + ff) AS DOUBLE)
                        / (CAST(tt + tf + ft + ff AS DOUBLE)
                           * CAST(tt + tf + ft + ff AS DOUBLE)))
                     / (1.0
                        - CAST((tt + tf) * (tt + ft)
                               + (ft + ff) * (tf + ff) AS DOUBLE)
                          / (CAST(tt + tf + ft + ff AS DOUBLE)
                             * CAST(tt + tf + ft + ff AS DOUBLE))),
                     6) AS kappa
        FROM c
    """
    out["zipf_fit"] = """
        WITH toks AS (
            SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                                                            '[^a-z0-9]+'),
                          x -> x <> '')) AS w
            FROM documents
        ),
        wf AS (SELECT w, count(*) AS freq FROM toks GROUP BY w),
        tot AS (
            SELECT CAST(sum(freq) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS vocab
            FROM wf
        ),
        top AS (
            SELECT freq,
                   row_number() OVER (ORDER BY freq DESC, w ASC) AS rank
            FROM wf QUALIFY rank <= 1000
        ),
        pts AS (
            SELECT ln(CAST(rank AS DOUBLE)) AS x,
                   ln(CAST(freq AS DOUBLE)) AS y
            FROM top
        ),
        s AS (
            SELECT count(*)::DOUBLE AS k, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx,
                   sum(y * y) AS syy
            FROM pts
        )
        SELECT tot.n_tokens, tot.vocab, CAST(s.k AS BIGINT) AS n_top,
               round((s.k * s.sxy - s.sx * s.sy)
                     / (s.k * s.sxx - s.sx * s.sx), 6) AS slope,
               round((s.sy - ((s.k * s.sxy - s.sx * s.sy)
                              / (s.k * s.sxx - s.sx * s.sx)) * s.sx)
                     / s.k, 6) AS intercept,
               round(((s.k * s.sxy - s.sx * s.sy)
                      * (s.k * s.sxy - s.sx * s.sy))
                     / ((s.k * s.sxx - s.sx * s.sx)
                        * (s.k * s.syy - s.sy * s.sy)), 6) AS r2
        FROM tot, s
    """
    return out
