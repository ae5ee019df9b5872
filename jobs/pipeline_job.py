"""spark-submit entry point: the training-data pipeline over a document
+ embedding corpus (the LLM-data operators as one deployable job).

Cluster:
    python scripts/package.py
    spark-submit --master <cluster> --py-files dist/smart_crawler_spark.zip \
        jobs/pipeline_job.py --input /data/sf100 --output hdfs:///tmp/pipe \
        --stages dedup,minhash,quality,ann

Local smoke:
    python jobs/pipeline_job.py --input /root/testdata/sf0.01 \
        --output /tmp/pipe_job --stages dedup,quality

Reads ``documents.parquet`` / ``embeddings.parquet`` under --input,
writes one parquet directory per stage under --output, prints one JSON
line of per-stage row counts and wall seconds. Stages:

  dedup    exact duplicate groups (hash-groupBy) + MinHash-LSH near-dup
           pairs collapsed to survivor groups (connected components)
  minhash  the raw near-dup pair table (banded LSH + exact verify)
  quality  language-ID + quality score + token stats + repetition stats,
           one joined table (all map-only column expressions)
  filter   the fused FineWeb-style keep decision (quality_gate: lang +
           quality + dup-trigram + length bounds in one map-only pass)
  scrub    cross-doc line dedup (boilerplate strip) + PII redaction
  passagescrub  Lee-et-al duplicated-passage removal (winnowing
           candidates -> exact LCS -> keep one occurrence corpus-wide)
  dsir     DSIR importance weights vs the lang='en' target slice
           (hashed two-LM log-ratio; bucket-bounded broadcast models)
  semdedup SemDeDup semantic dedup over the embedding table (k-means
           cells + multi-probe, exact cosine verify, keep-lowest-id)
  pack     token-budget sequence packing (concat-and-chunk layout via
           the two-phase distributed prefix sum)
  mix      target-distribution lang rebalance (domain_mix) + the
           reproducible global training order (deterministic_shuffle)
  tmix     temperature-scaled lang rebalance (alpha-sampling with
           data-derived targets; same single-map-filter plan)
  classify fastText-style hashed n-gram classifier inference (broadcast
           bucket-bounded weights, mean pooling + sigmoid)
  chunk    overlapping character chunks with offsets (RAG/encoder prep,
           map-only)
  encgate  encoding-health triage (U+FFFD/control/mojibake counts) +
           character-distribution entropy, one joined map-only table
  truncdedup prefix-containment (truncated-scrape) duplicate pairs
  tfidf    lexical all-pairs tf-idf cosine (inverted-index join, df cap)
  split    leakage-safe train/val/test assignment per near-dup
           component (no dup pair straddles train and eval)
  card     the one-row corpus summary (docs, words, quality, languages)
  eval     the quality gate's report card: exact ROC-AUC + Cohen's
           kappa vs the is-English reference + 10-bin calibration table
  hybrid   hybrid retrieval: BM25 lexical + cosine vector lists fused
           by reciprocal rank (RRF)
  keepbest quality-aware dedup survivors (components keep their
           highest-quality member, not the min id)
  export   corpus -> deterministic WARC shard blobs (archive sink)
  ingest   incremental batch-vs-corpus dedup: the corpus LSH band index
           persisted bucketed on (band, bucket), probed by the batch
  ann      ANN ladder over the embedding table: LSH-bucketed,
           PQ (ADC scan + exact rerank) and IVF-PQ cosine top-k
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo, "smart_crawler_spark")):
    sys.path.insert(0, _repo)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="dir with documents.parquet"
                   " / embeddings.parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--stages", default="dedup,quality")
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--master", default=None)
    args = p.parse_args()
    stages = set(args.stages.split(","))

    from pyspark.sql import functions as F

    from smart_crawler_spark.operators import textops
    from smart_crawler_spark.session import spark_session

    spark = spark_session(app_name="pipeline-job", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(os.path.join(args.input, "documents.parquet"))
    report: dict = {"stages": {}}

    def run(name: str, df_factory):
        t0 = time.monotonic()
        out = df_factory()
        dest = os.path.join(args.output, name)
        out.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        report["stages"][name] = {
            "rows": n, "sec": round(time.monotonic() - t0, 3), "path": dest,
        }

    if "dedup" in stages:
        run("exact_dedup", lambda: textops.exact_dedup(docs))

        def _groups():
            from smart_crawler_spark.operators.components import dedup_groups
            from smart_crawler_spark.operators.minhash import (
                minhash_near_dup_pairs,
            )

            pairs = minhash_near_dup_pairs(docs, threshold=args.jaccard)
            return dedup_groups(pairs, docs)

        run("near_dup_groups", _groups)

    if "minhash" in stages:
        from smart_crawler_spark.operators.minhash import (
            minhash_near_dup_pairs,
        )

        run("minhash_pairs", lambda: minhash_near_dup_pairs(
            docs, threshold=args.jaccard))

    if "quality" in stages:

        def _quality():
            q = textops.quality_score(docs)
            return (
                q.join(textops.language_id(docs), "doc_id")
                .join(textops.token_stats(docs), "doc_id")
                .join(textops.repetition_stats(docs), "doc_id")
            )

        run("quality", _quality)

    if "filter" in stages:
        run("filter", lambda: textops.quality_gate(docs))

    if "dsir" in stages:
        run("dsir", lambda: textops.dsir_weights(
            docs, F.col("lang") == "en"))

    if "semdedup" in stages:

        def _semdedup():
            from smart_crawler_spark.operators.simsearch import (
                semantic_dedup,
            )

            emb = spark.read.parquet(
                os.path.join(args.input, "embeddings.parquet")
            )
            return semantic_dedup(emb, threshold=0.95)

        run("semdedup", _semdedup)

    if "pack" in stages:
        run("pack", lambda: textops.sequence_pack(docs, budget=2048))

    if "mix" in stages:
        # rebalance the lang-skewed corpus to a fixed target mix, then
        # lay the survivors out in the reproducible training order
        def _mix():
            from smart_crawler_spark.operators.relational import (
                deterministic_shuffle,
                domain_mix,
            )

            mixed = domain_mix(
                docs, "lang", "doc_id",
                {"en": 0.40, "de": 0.15, "es": 0.15, "fr": 0.15,
                 "zh": 0.15},
            )
            return deterministic_shuffle(mixed, "doc_id", n_shards=8)

        run("mix", _mix)

    if "tmix" in stages:

        def _tmix():
            from smart_crawler_spark.operators.relational import (
                temperature_mix,
            )

            return temperature_mix(docs, "lang", "doc_id", alpha=0.5)

        run("tmix", _tmix)

    if "classify" in stages:
        run("classify", lambda: textops.hashed_ngram_classifier(docs))

    if "chunk" in stages:
        run("chunk", lambda: textops.chunk_documents(docs))

    if "encgate" in stages:
        # encoding health + character entropy in one joined triage table
        def _encgate():
            return textops.encoding_quality(docs).join(
                textops.char_entropy(docs).select(
                    "doc_id", "n_distinct", "entropy"
                ),
                "doc_id",
                "left",
            )

        run("encgate", _encgate)

    if "truncdedup" in stages:
        run("truncdedup", lambda: textops.truncation_pairs(docs))

    if "tfidf" in stages:
        run("tfidf", lambda: textops.tfidf_cosine_pairs(
            docs, threshold=0.5))

    if "split" in stages:
        # leakage-safe train/val/test: split assigned per near-dup
        # component so no dup pair straddles train and eval
        def _split():
            from smart_crawler_spark.operators.components import dedup_groups
            from smart_crawler_spark.operators.minhash import (
                minhash_near_dup_pairs,
            )

            pairs = minhash_near_dup_pairs(docs, threshold=args.jaccard)
            comp = dedup_groups(pairs, docs)
            b = textops.md5_hash32(F.col("component")) % 10
            return comp.select(
                "doc_id",
                "component",
                F.when(b < 8, F.lit("train"))
                .when(b == 8, F.lit("val"))
                .otherwise(F.lit("test"))
                .alias("split"),
            )

        run("split", _split)

    if "card" in stages:
        run("card", lambda: textops.corpus_summary(docs))

    if "eval" in stages:
        # the quality gate's report card: does the heuristic score
        # rank/agree with the is-English reference label (AUC, kappa),
        # and is it calibrated (reliability bins)?
        from smart_crawler_spark.operators.evalmetrics import (
            calibration_bins,
            cohens_kappa,
            roc_auc,
        )

        def _scored():
            return textops.quality_score(docs).select(
                "doc_id", "quality"
            ).join(
                docs.select(
                    "doc_id", (F.col("lang") == "en").alias("y")
                ),
                "doc_id",
            )

        run("eval_auc", lambda: roc_auc(_scored(), "quality", "y"))
        run("eval_calibration", lambda: calibration_bins(
            _scored(), "quality", "y", n_bins=10))
        run("eval_kappa", lambda: cohens_kappa(
            _scored().select(
                (F.col("quality") >= 0.77).alias("a"),
                F.col("y").alias("b"),
            )))

    if "hybrid" in stages:
        # hybrid retrieval: BM25 lexical list + brute-force cosine
        # vector list (query = vec 0), fused by reciprocal rank
        def _hybrid():
            from smart_crawler_spark.operators.simsearch import cosine_topk

            emb = spark.read.parquet(
                os.path.join(args.input, "embeddings.parquet")
            )
            lex = textops.bm25_topk(
                docs, ["spark", "window", "merge"], k=100
            )
            vec = cosine_topk(
                emb.filter(F.col("vec_id") == 0), emb, k=100
            ).select(F.col("neighbor_id").alias("doc_id"), "rank")
            return textops.rrf_fuse(
                lex, vec, id_col="doc_id", k_const=60, topn=20
            )

        run("hybrid", _hybrid)

    if "keepbest" in stages:
        # quality-aware survivor decision over the near-dup components
        def _keepbest():
            from smart_crawler_spark.operators.components import (
                dedup_groups,
                keep_best,
            )
            from smart_crawler_spark.operators.minhash import (
                minhash_near_dup_pairs,
            )

            pairs = minhash_near_dup_pairs(docs, threshold=args.jaccard)
            groups = dedup_groups(pairs, docs)
            scores = textops.quality_score(docs).select(
                "doc_id", "quality"
            )
            return keep_best(groups, scores)

        run("keepbest", _keepbest)

    if "scrub" in stages:
        # training-corpus scrub: PII placeholders (map-only) over docs
        # whose cross-corpus boilerplate lines were stripped first
        def _scrub():
            cleaned = textops.line_dedup(docs).select(
                "doc_id", F.col("clean_text").alias("text")
            )
            return textops.redact_pii(cleaned)

        run("scrub", _scrub)

    if "passagescrub" in stages:
        # Lee-et-al duplicated-passage removal: keep one occurrence
        # corpus-wide, strip the rest (detection = the two-pass exact
        # winnowing+LCS pipeline; removal = candidate-volume passage
        # join + JVM aggregate(replace) fold)
        run(
            "passagescrub",
            lambda: textops.dup_passage_scrub(docs),
        )

    if "export" in stages:
        # corpus -> WARC shard blobs (the archive-interchange sink):
        # deterministic shard bytes, readable back via warc_records
        def _export():
            from smart_crawler_spark.sources.warc import write_warc_shards

            payload = docs.select(
                "doc_id",
                F.concat(
                    F.lit("http://corpus.test/doc/"),
                    F.col("doc_id").cast("string"),
                ).alias("url"),
                F.encode(F.col("text"), "UTF-8").alias("payload"),
            )
            return write_warc_shards(payload, n_shards=16)

        run("export", _export)

    if "ingest" in stages:

        def _ingest():
            from smart_crawler_spark.operators.minhash import (
                band_buckets,
                incremental_near_dup,
                minhash_signatures,
            )
            from smart_crawler_spark.sources.bucketed import write_bucketed

            # the continuous-ingest shape: even docs are the standing
            # corpus whose LSH index is persisted BUCKETED on the probe
            # key (on Iceberg: bucket(N, band, bucket) transform), odd
            # docs are the incoming batch probing it — the probe join
            # shuffles only the batch side
            corpus = docs.filter(F.col("doc_id") % 2 == 0)
            batch = docs.filter(F.col("doc_id") % 2 == 1)
            idx = band_buckets(
                minhash_signatures(corpus, num_perm=64), bands=16, num_perm=64
            )
            t = write_bucketed(
                idx, "lsh_index", key=["band", "bucket"], n_buckets=32,
                database="pipe_lsh",
                location=os.path.join(args.output, "lsh_wh"),
            )
            return incremental_near_dup(
                corpus, batch, threshold=args.jaccard,
                num_perm=64, bands=16,
                corpus_index=spark.table(t),
            )

        run("incremental_dedup", _ingest)

    if "ann" in stages:

        def _ann():
            from smart_crawler_spark.operators.simsearch import (
                lsh_bucketed_topk,
            )

            emb = spark.read.parquet(
                os.path.join(args.input, "embeddings.parquet")
            )
            # deterministic query pick (orderBy before limit) + eager
            # checkpoint: lsh_bucketed_topk evaluates the query plan on
            # three sides (dim inference, band explode, vector re-join)
            # — an unordered limit could select different rows per
            # evaluation and silently drop join matches
            queries = (
                emb.filter(F.col("vec_id") % 200 == 0)
                .orderBy("vec_id").limit(8).localCheckpoint()
            )
            return lsh_bucketed_topk(queries, emb, k=args.topk)

        run("ann_topk", _ann)

        # the compressed-corpus legs of the ANN ladder: PQ codes +
        # ADC scan + exact rerank, and the FAISS-style IVF-PQ
        def _ann_pq(which):
            from smart_crawler_spark.operators.simsearch import (
                ivfpq_topk,
                pq_topk,
            )

            emb = spark.read.parquet(
                os.path.join(args.input, "embeddings.parquet")
            )
            queries = (
                emb.filter(F.col("vec_id") % 200 == 0)
                .orderBy("vec_id").limit(8).localCheckpoint()
            )
            if which == "pq":
                return pq_topk(queries, emb, k=args.topk)
            return ivfpq_topk(queries, emb, k=args.topk)

        run("ann_pq_topk", lambda: _ann_pq("pq"))
        run("ann_ivfpq_topk", lambda: _ann_pq("ivfpq"))

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
