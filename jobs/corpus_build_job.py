"""spark-submit entry point: CRAWL -> CORPUS end-to-end — the crawl
engine's output feeding the LLM-curation surface in one deployable run
(the integration the standalone jobs prove separately: crawl_job stops
at the record sink, pipeline_job starts from a pre-made
documents.parquet; this job closes the gap).

Stages over one deterministic synthetic multi-host site:

  crawl     generate_site_pages + load_target_tsv -> CrawlEngine.run
            (all hosts in one frontier, unbounded budget — full site
            coverage so the downstream plants are closed-form)
  extract   detail-page records -> rule-rendered HTML -> the
            production extract_main_text Catalyst strip -> documents
            (url, host, n, text). Render plants, by detail index n
            with this precedence (junk > contam > dup > normal):
              n % 40 == 39  junk     stopword-free 'zz' soup
              n % 30 == 29  contam   carries the benchmark sentence
              n % 25 == 24  dup      constant body on every mirror
              otherwise     normal   title + caption + archive prose
  gate      quality_gate (fused lang/quality/dup-trigram/length pass)
            — junk pages predict 'und' and drop; everything else keeps
  decon     benchmark_contamination vs the 1-sentence benchmark set —
            13-gram broadcast probe drops the contam plants
  dedup     exact_dedup over the survivors — the constant dup body
            collapses to its lexicographically-first url
  pack      shard_pack over the kept docs (md5-bucket byte-stream
            layout, the webdataset shard rule), size = octet_length

Writes one parquet dir per stage under --output plus a JSON manifest
line on stdout. Audited end-to-end by tests/test_corpus_build_job.py:
the checker replays the site arithmetic + plant rules + packing prefix
sum in pure Python/DuckDB and must reproduce every stage's output.

Cluster:
    python scripts/package.py
    spark-submit --master <cluster> --py-files dist/smart_crawler_spark.zip \
        jobs/corpus_build_job.py --hosts 8 --details 200 \
        --output hdfs:///tmp/corpus

Local smoke:
    python jobs/corpus_build_job.py --hosts 3 --details 40 \
        --output /tmp/corpus_job
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

# the planted benchmark sentence (>= 13 words so the 13-gram probe
# fires); the contam render embeds it verbatim
BENCH_SENTENCE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "watch quietly tonight"
)
JUNK_EVERY, CONTAM_EVERY, DUP_EVERY = 40, 30, 25
DUP_BODY = (
    "The shared body of the duplicated detail entry appears on every "
    "mirror page"
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hosts", type=int, default=3)
    p.add_argument("--dirs", type=int, default=2)
    p.add_argument("--chain", type=int, default=2)
    p.add_argument("--details", type=int, default=40)
    p.add_argument("--shard-bytes", type=int, default=4096)
    p.add_argument("--output", required=True)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
    from smart_crawler_spark.datagen.site import (
        SiteConfig,
        generate_site_pages,
        target_tsv,
    )
    from smart_crawler_spark.operators.images import shard_pack
    from smart_crawler_spark.operators.textops import (
        benchmark_contamination,
        exact_dedup,
        extract_main_text,
        quality_gate,
    )
    from smart_crawler_spark.session import spark_session
    from smart_crawler_spark.sources.targets import load_target_tsv

    spark = spark_session(app_name="corpus-build-job", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.monotonic()
    manifest: dict = {}

    def write(name: str, df):
        path = os.path.join(args.output, name)
        df.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        manifest[name] = n
        return spark.read.parquet(path)

    # -- crawl ----------------------------------------------------------
    cfg = SiteConfig(
        n_hosts=args.hosts, dirs=args.dirs, chain=args.chain,
        details_per_page=args.details,
    )
    pages = generate_site_pages(spark, cfg)
    model = load_target_tsv(target_tsv(cfg))
    eng = CrawlEngine(
        spark, pages, model, os.path.join(args.output, "crawl"),
        EngineConfig(budget_per_host=1 << 30),
    )
    res = eng.run([f"http://{cfg.host(k)}/" for k in range(args.hosts)])
    manifest["crawl_rounds"] = res.rounds
    manifest["crawl_pages"] = res.order.count()

    # -- extract: records -> HTML -> text -------------------------------
    # detail records carry fields [title, caption, photo, back] in the
    # model's data-link order (datagen/site.py target_rows)
    det = res.records.filter(F.col("page_class") == "detail").select(
        "url",
        F.regexp_extract("url", r"^http://([^/]+)/", 1).alias("host"),
        F.regexp_extract("url", r"/detail/(\d+)$", 1)
        .cast("long")
        .alias("n"),
        F.col("fields")[0].alias("title"),
        F.col("fields")[1].alias("caption"),
    )
    n = F.col("n")
    junk = n % JUNK_EVERY == JUNK_EVERY - 1
    contam = ~junk & (n % CONTAM_EVERY == CONTAM_EVERY - 1)
    dup = ~junk & ~contam & (n % DUP_EVERY == DUP_EVERY - 1)
    body = (
        F.when(junk, F.lit("<p>zz zz zz zz zz zz zz zz</p>"))
        .when(
            contam,
            F.lit(f"<p>The study notes that {BENCH_SENTENCE}</p>"),
        )
        .when(dup, F.lit(f"<p>{DUP_BODY}</p>"))
        .otherwise(
            F.concat(
                F.lit("<h1>"),
                F.col("title"),
                F.lit("</h1><p>The picture shows "),
                F.col("caption"),
                F.lit(" and the page is part of the archive</p>"),
            )
        )
    )
    html = F.concat(
        F.lit("<html><head><title>ignored</title>"
              "<script>var x=1;</script></head><body>"),
        body,
        F.lit("</body></html>"),
    )
    docs = write(
        "documents",
        extract_main_text(
            det.select("url", "host", "n", html.alias("html")),
            html_col="html",
            id_col="url",
        )
        .withColumnRenamed("clean_text", "text")
        .join(det.select("url", "host", "n"), "url"),
    )

    # -- curation chain -------------------------------------------------
    gate = write(
        "gate",
        quality_gate(
            docs, min_quality=0.1, min_words=5, id_col="url"
        ).select("url", "pred_lang", "keep"),
    )
    kept1 = docs.join(gate.filter("keep").select("url"), "url")
    bench = spark.createDataFrame([(0, BENCH_SENTENCE)], "bid long, text string")
    decon = write(
        "decon",
        benchmark_contamination(
            kept1, bench, id_col="url", bench_text_col="text"
        ).select("url", "n_hits", "contaminated"),
    )
    kept2 = kept1.join(
        decon.filter(~F.col("contaminated")).select("url"), "url"
    )
    groups = exact_dedup(kept2, id_col="url")
    dedup = write(
        "dedup",
        kept2.select("url")
        .join(
            groups.select(
                F.col("canonical_id").alias("url"),
                F.lit(True).alias("survivor"),
                "dup_count",
            ),
            "url",
            "left",
        )
        .select(
            "url",
            F.coalesce("survivor", F.lit(False)).alias("survivor"),
            F.coalesce("dup_count", F.lit(0)).alias("dup_count"),
        ),
    )
    kept = write(
        "kept",
        kept2.join(dedup.filter("survivor").select("url"), "url").select(
            "url", "host", "n", "text"
        ),
    )

    # -- pack -----------------------------------------------------------
    shards = write(
        "shards",
        shard_pack(
            kept.select(
                "url", F.octet_length("text").alias("n_bytes")
            ),
            shard_bytes=args.shard_bytes,
            id_col="url",
            size_col="n_bytes",
        ),
    )

    manifest["sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
