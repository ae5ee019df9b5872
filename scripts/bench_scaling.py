"""Scaling-efficiency evidence (north_rule): run the same executor-bound
frontier jobs at two parallelism levels (default local[8] vs local[32])
on identical input, report throughput at both + scaling efficiency.

Each level runs in a fresh subprocess (own JVM) to avoid cache warm-up
bias. Jobs (the crawl hot path, sized so executor work dominates):

  dedup      — exact seen-filter anti-join: 8M candidates vs 4M-key seen
  topk       — per-host priority top-K over a mildly skewed frontier
  topk_skew  — same top-K with 90% of the frontier on ONE host (the
               adversarial politeness case; salted path cross-checked)
  links      — explode + broadcast-classify + intra-batch dedup, 2M pages
  crawl      — end-to-end engine drain of a flat synthetic site
  crawl_skew — end-to-end drain with ~90% of URLs on host 0
  ingest     — incremental batch-vs-corpus near-dup (Arrow signature
               UDF + band-bucket probe join)
  vision     — image-payload kernels: watermark tile mining and the
               patch round trip (decode-bound Arrow UDFs + hash-only
               shuffle), untimed corpus generation
  imgingest  — incremental image-ingest dedup: a batch probes the
               stored joint (caption x phash-block) index (index build
               untimed — once per corpus snapshot)
  graph      — pointer-jumping redirect resolution: 4 self-join rounds
               over an 8M-edge chain map (URL-string keys, untimed
               edge generation)
  evalfuzzy  — exact ROC-AUC over 8M heavy-tie rows (closed-form 0.5
               asserted) + FastSS fuzzy join over 440k doubled-hex
               keys (exact planted-pair count asserted)

Usage: python scripts/bench_scaling.py [--cpus 8,32] [--scale 1.0]
                                       [--jobs dedup,topk,links,crawl]
Prints one JSON line; also appended to BENCH_SCALING.jsonl.
`--jobs` scopes the run — e.g. a crawl-only sample at a larger --scale,
where per-round driver overhead (constant vs cluster size) amortizes
to production-batch share without paying for 3x kernel reruns.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

JOB = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from smart_crawler_spark.session import spark_session

cpus = int(os.environ["N_CPUS"])
scale = float(os.environ.get("SCALE", "1.0"))
# same shuffle partitioning at both levels: the JOB is identical, only
# the executor-thread count differs (the N vs 4N executors evidence)
spark = spark_session(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=64,
                      extra_conf={{"spark.local.dir": "/dev/shm/spark-scaling",
                                   "spark.driver.memory": "24g"}})
spark.sparkContext.setLogLevel("ERROR")

def timed(make_df):
    best = None
    for _ in range(3):  # warm-up then measure (JIT/codegen compile bias)
        t0 = time.monotonic()
        n = make_df().count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return n, best

N_CAND = int(8_000_000 * scale)
N_SEEN = N_CAND // 2
N_FRONT = int(4_000_000 * scale)
N_PAGES = int(2_000_000 * scale)
jobs = set(os.environ.get("JOBS", "dedup,topk,links,crawl").split(","))
out = {{}}

# --- dedup: exact anti-join on xxhash64 keys, co-partitioned by shard ---
if "dedup" in jobs:
    from smart_crawler_spark.frontier.dedup import SeenFilter
    f = SeenFilter(spark, use_bloom=False)
    seen = spark.range(N_SEEN).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"))
    f.add(seen); f.materialize()
    cand = spark.range(N_CAND).select(
        F.col("id"),
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"))
    n, dt = timed(lambda: f.filter_new(cand))
    assert n == N_CAND - N_SEEN
    out["dedup"] = {{"rows": N_CAND, "sec": round(dt, 3),
                     "rows_per_sec": round(N_CAND / dt)}}

# --- topk: skewed per-host priority selection (salted two-phase) --------
if "topk" in jobs:
    front = spark.range(N_FRONT).select(
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
        F.when(F.col("id") % 5 == 0, F.lit("hot.test")).otherwise(
            F.concat(F.lit("site"), (F.col("id") % 997))).alias("host"),
        F.lit("detail").alias("page_class"),
        (F.col("id") % 3).cast("int").alias("class_depth"),
        F.lit("detail").alias("class_name"),
        F.lit(None).cast("string").alias("form_params"),
    )
    from smart_crawler_spark.frontier.queue import pick_batch
    # WindowGroupLimit path (salt=0): map-side partial top-K, one shuffle —
    # measured 2.7x faster than the salted two-phase (see queue.py skew note)
    nb, dt = timed(lambda: pick_batch(front, budget_per_host=100, salt_buckets=0))
    out["topk"] = {{"rows": N_FRONT, "sec": round(dt, 3),
                    "rows_per_sec": round(N_FRONT / dt), "batch": nb}}

# --- topk_skew: 90% of the frontier on ONE host (north_rule politeness
# under adversarial skew). The WindowGroupLimit plan (salt=0) keeps the
# map-side partial limit parallel — each map task emits <= budget rows
# per host BEFORE the shuffle, so the hot host's final window sees
# tasks x budget rows, not 90% of the frontier; the salted two-phase
# path is cross-checked for output size at the same budget ------------
if "topk_skew" in jobs:
    front = spark.range(N_FRONT).select(
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
        F.when(F.col("id") % 10 < 9, F.lit("hot.test")).otherwise(
            F.concat(F.lit("site"), (F.col("id") % 997))).alias("host"),
        F.lit("detail").alias("page_class"),
        (F.col("id") % 3).cast("int").alias("class_depth"),
        F.lit("detail").alias("class_name"),
        F.lit(None).cast("string").alias("form_params"),
    )
    from smart_crawler_spark.frontier.queue import pick_batch
    nb, dt = timed(lambda: pick_batch(front, budget_per_host=100, salt_buckets=0))
    nb_s, dt_s = timed(lambda: pick_batch(front, budget_per_host=100, salt_buckets=32))
    assert nb == nb_s, (nb, nb_s)
    out["topk_skew"] = {{"rows": N_FRONT, "sec": round(dt, 3),
                         "rows_per_sec": round(N_FRONT / dt), "batch": nb,
                         "salted_sec": round(dt_s, 3)}}

# --- topk_giant: the crawl_skew pick regime — budget ~ pending/8, so
# neither the WindowGroupLimit map-side partial nor salting cuts
# anything (per-partition hot rows << budget) and the final per-host
# rank is the serialization suspect. Isolates the pick from the rest
# of the engine round ------------------------------------------------
if "topk_giant" in jobs:
    front = spark.range(N_FRONT).select(
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
        F.when(F.col("id") % 10 < 9, F.lit("hot.test")).otherwise(
            F.concat(F.lit("site"), (F.col("id") % 997))).alias("host"),
        F.lit("detail").alias("page_class"),
        (F.col("id") % 3).cast("int").alias("class_depth"),
        F.lit("detail").alias("class_name"),
        F.lit(None).cast("string").alias("form_params"),
    )
    from smart_crawler_spark.frontier.queue import pick_batch
    giant_budget = int(N_FRONT * 0.9) // 8
    nb, dt = timed(lambda: pick_batch(front, budget_per_host=giant_budget,
                                      salt_buckets=0))
    out["topk_giant"] = {{"rows": N_FRONT, "sec": round(dt, 3),
                          "rows_per_sec": round(N_FRONT / dt), "batch": nb,
                          "budget": giant_budget}}

# --- textops: the text-pipeline kernels (classifier inference +
# chunking) over a synthetic JVM-generated corpus — per-doc map work +
# one doc-keyed shuffle (classifier) / zero shuffles (chunker). The
# corpus localCheckpoints first so the kernels are timed, not datagen --
if "textops" in jobs:
    from smart_crawler_spark.operators.textops import (
        chunk_documents, hashed_ngram_classifier)
    N_DOCS = int(400_000 * scale)
    vocab = ("amber basalt cedar delta ember fjord garnet harbor indigo "
             "juniper krypton lagoon marble nectar onyx prairie quartz "
             "russet sienna tundra").split()
    warr = F.array(*[F.lit(w) for w in vocab])
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(80)),
            lambda i: F.element_at(
                warr, (((F.col("id") + 1) * i) % 20 + 1).cast("int")),
        )).alias("text")).localCheckpoint()
    n, dt = timed(lambda: hashed_ngram_classifier(docs))
    out["classify"] = {{"rows": N_DOCS, "sec": round(dt, 3),
                        "rows_per_sec": round(N_DOCS / dt), "scored": n}}
    n2, dt2 = timed(lambda: chunk_documents(docs))
    out["chunk"] = {{"rows": N_DOCS, "sec": round(dt2, 3),
                     "rows_per_sec": round(N_DOCS / dt2), "chunks": n2}}

# --- links: explode out-links + broadcast model classify + window dedup --
if "links" in jobs:
    pages = spark.range(N_PAGES).select(
        F.lit("detail").alias("page_class"),
        (F.col("id") % 3).cast("int").alias("class_depth"),
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
        F.concat(F.lit("site"), (F.col("id") % 997)).alias("host"),
        F.create_map(
            F.lit("//a[@x]"), F.array(
                F.concat(F.lit("http://x/l"), F.col("id") % (N_PAGES // 2)),
                F.concat(F.lit("http://x/l"), (F.col("id") + 1) % (N_PAGES // 2))),
            F.lit("//a[@y]"), F.array(
                F.concat(F.lit("http://x/m"), F.col("id") % 1000)),
        ).alias("out_links"),
    )
    model = spark.createDataFrame(
        [("detail", "//a[@x]", 0, "detail", 2), ("detail", "//a[@y]", 1, "dir", 1)],
        "src_class string, xpath string, edge_pos int, dst_class string, dst_depth int",
    )
    from smart_crawler_spark.crawler.extract import extract_links
    from smart_crawler_spark.frontier.canonical import canonical_relative_url, url_seen_key
    from pyspark.sql.window import Window
    links = extract_links(pages, model)
    w = Window.partitionBy("host", "rel").orderBy("src_depth", "src_class", "src_url", "link_seq")
    deduped = (links
        .withColumn("rel", canonical_relative_url(F.col("url"), F.col("form_params")))
        .withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        .withColumn("url_hash", url_seen_key(F.col("url"), F.col("form_params"))))
    nl, dt = timed(lambda: deduped)
    out["links"] = {{"rows": N_PAGES * 3, "sec": round(dt, 3),
                     "rows_per_sec": round(N_PAGES * 3 / dt), "deduped": nl}}

# --- ingest: incremental batch-vs-corpus near-dup probe. The cost is
# the Arrow signature UDF over corpus+batch (embarrassingly parallel)
# plus the (band, bucket) probe join — the continuous-ingest dedup
# path's scaling story in one number --------------------------------
if "ingest" in jobs:
    from smart_crawler_spark.operators.minhash import incremental_near_dup

    N_DOCS = int(200_000 * scale)

    def text_of(c):
        # 20 unique 8-hex words per content seed: exact copies share all
        # trigram shingles, novel docs share none
        return F.concat_ws(" ", *[
            F.substring(F.md5(F.concat(c.cast("string"), F.lit(f"_{{j}}"))), 1, 8)
            for j in range(20)
        ])

    corpus = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), text_of(F.col("id")).alias("text"))
    M = N_DOCS // 4
    batch = spark.range(M).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        text_of(
            F.when(F.col("id") % 2 == 0, (F.col("id") * 2) % N_DOCS)
            .otherwise(F.col("id") + 20_000_000)
        ).alias("text"))
    nd, dt = timed(lambda: incremental_near_dup(
        corpus, batch, threshold=0.8).filter(F.col("is_dup")))
    assert nd == (M + 1) // 2, (nd, M)
    out["ingest"] = {{"rows": N_DOCS + M, "sec": round(dt, 3),
                      "rows_per_sec": round((N_DOCS + M) / dt),
                      "dups": nd}}

# --- vision: the image-payload hot path (graft cell pyspark x image).
# Corpus generation (pure-numpy PNG/JPEG encode) runs ONCE untimed;
# the timed kernels are (a) watermark tile mining — decode + 8x8 tile
# + md5 inside the Arrow batch, hash-only shuffle, distinct-count agg,
# broadcast join-back — and (b) the patch round trip — decode + tile,
# shuffle tiles by image_id, rebuild, independent re-decode + compare.
# Both are decode-bound (measured ~1.5 ms/img), i.e. exactly the work
# that must scale linearly with executors over a 10^10-image corpus --
if "vision" in jobs:
    from smart_crawler_spark.datagen.images import generate_images
    from smart_crawler_spark.operators.images import (
        reassemble_verify, watermark_patches)

    N_IMG = int(48_000 * scale)
    imgs = generate_images(
        spark, N_IMG, jpeg_every=10, logo_every=7,
        partitions=min(N_IMG // 16, 512),
    ).localCheckpoint()
    n_planted = imgs.count() and sum(
        1 for i in range(N_IMG) if i % 7 == 6)
    nm, dt_m = timed(lambda: watermark_patches(imgs, min_images=5))
    assert nm == n_planted, (nm, n_planted)
    nr, dt_r = timed(lambda: reassemble_verify(imgs).filter("ok"))
    assert nr == N_IMG, (nr, N_IMG)
    out["vision"] = {{
        "rows": N_IMG,
        "sec": round(dt_m, 3),
        "rows_per_sec": round(N_IMG / dt_m),
        "patch_rt_sec": round(dt_r, 3),
        "patch_rt_rows_per_sec": round(N_IMG / dt_r),
        "planted": nm,
    }}

# --- imgingest: incremental image-ingest dedup — a batch probes the
# corpus' joint (caption-md5 x phash-block) index; cost = batch decode
# (Arrow UDF, untimed corpus build) + two id-only bucket joins
if "imgingest" in jobs:
    from smart_crawler_spark.datagen.images import (
        generate_images as _gen_imgs, generate_ingest_batch)
    from smart_crawler_spark.operators.images import (
        incremental_image_dedup, joint_block_index)

    N_CORP = int(24_000 * scale)
    M_BATCH = int(6_000 * scale)
    corp = _gen_imgs(spark, N_CORP, jpeg_every=10,
                     partitions=min(N_CORP // 16, 512)).localCheckpoint()
    corp.count()
    # the stored-index production path: index build untimed (once per
    # corpus snapshot), the probe is the recurring per-batch cost
    idx = joint_block_index(corp, max_hamming=9).localCheckpoint()
    idx.count()
    batch = generate_ingest_batch(spark, M_BATCH, jpeg_every=10)
    batch = batch.localCheckpoint()
    batch.count()
    def _probe():
        return incremental_image_dedup(
            corp, batch, max_hamming=9, corpus_index=idx
        ).filter("is_dup")
    nd, dt_i = timed(_probe)
    want_dups = sum(1 for j in range(M_BATCH) if j % 4 < 3)
    assert nd == want_dups, (nd, want_dups)
    out["imgingest"] = {{
        "corpus": N_CORP, "batch": M_BATCH, "sec": round(dt_i, 3),
        "rows_per_sec": round(M_BATCH / dt_i),
    }}

# --- crawl: end-to-end engine drain of a deterministic synthetic site ----
# (the north-rule metric itself: fetched URLs/sec at both parallelism
# levels; one timed run — the engine is round-based, rerunning it would
# re-crawl, so no warm-up min-of-3 here)
if "crawl" in jobs:
    import tempfile, shutil
    from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
    from smart_crawler_spark.datagen.site import (SiteConfig, generate_site_pages,
                                                  target_tsv)
    from smart_crawler_spark.sources.targets import load_target_tsv
    # flat site (chain=1, fat dirs) so the detail round carries ~0.5M URLs:
    # per-round driver overhead (~constant vs cluster size) amortizes and the
    # measured scaling reflects the kernels, as it would at production batch
    # sizes (millions of URLs/round)
    site = SiteConfig(n_hosts=16, dirs=4, chain=1,
                      details_per_page=int(8000 * scale), n_images=1000,
                      skew_factor=2)
    pages = generate_site_pages(spark, site).localCheckpoint()
    n_pages = pages.count()
    workdir = tempfile.mkdtemp(prefix="scaling_crawl_")
    try:
        eng = CrawlEngine(spark, pages, load_target_tsv(target_tsv(site)), workdir,
                          EngineConfig(budget_per_host=int(70000 * scale),
                                       salt_buckets=0, use_bloom=False))
        t0 = time.monotonic()
        res = eng.run([f"http://{{site.host(k)}}/" for k in range(site.n_hosts)])
        dt = time.monotonic() - t0
        fetched = res.order.filter("fetched").count()
        assert fetched == n_pages, (fetched, n_pages)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    out["crawl"] = {{"rows": fetched, "sec": round(dt, 3),
                     "rows_per_sec": round(fetched / dt),
                     "rounds": res.rounds,
                     "round_metrics": [
                         {{k: v for k, v in m.items()
                           if k in ("round", "batch", "sec", "sec_fetch",
                                    "sec_sinks", "sec_state")}}
                         for m in res.metrics]}}

# --- crawl_skew: end-to-end drain where ~90% of URLs live on host 0
# (skew_factor 135 over 16 hosts: 135/(135+15)). The hot host drains
# over several politeness-budget rounds while the engine's skewed
# frontier windows, fetch joins, and sinks all see the hot partition —
# the adversarial version of the flat crawl job above ----------------
if "crawl_skew" in jobs:
    import tempfile, shutil
    from smart_crawler_spark.crawler.engine import CrawlEngine, EngineConfig
    from smart_crawler_spark.datagen.site import (SiteConfig, generate_site_pages,
                                                  target_tsv)
    from smart_crawler_spark.sources.targets import load_target_tsv
    site = SiteConfig(n_hosts=16, dirs=4, chain=1,
                      details_per_page=int(1000 * scale), n_images=1000,
                      skew_factor=135)
    pages = generate_site_pages(spark, site).localCheckpoint()
    n_pages = pages.count()
    hot = pages.filter(F.col("host") == site.host(0)).count()
    workdir = tempfile.mkdtemp(prefix="scaling_crawl_skew_")
    try:
        eng = CrawlEngine(spark, pages, load_target_tsv(target_tsv(site)), workdir,
                          EngineConfig(budget_per_host=int(70000 * scale),
                                       salt_buckets=0, use_bloom=False))
        t0 = time.monotonic()
        res = eng.run([f"http://{{site.host(k)}}/" for k in range(site.n_hosts)])
        dt = time.monotonic() - t0
        fetched = res.order.filter("fetched").count()
        assert fetched == n_pages, (fetched, n_pages)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    out["crawl_skew"] = {{"rows": fetched, "sec": round(dt, 3),
                          "rows_per_sec": round(fetched / dt),
                          "rounds": res.rounds,
                          "hot_host_share": round(hot / n_pages, 3),
                          "round_metrics": [
                              {{k: v for k, v in m.items()
                                if k in ("round", "batch", "sec", "sec_fetch",
                                         "sec_sinks", "sec_state")}}
                              for m in res.metrics]}}

# --- evalfuzzy: the model-eval + short-key-dedup kernels, both with
# analytically exact expected outputs so correctness is verified while
# being timed. (a) exact ROC-AUC over N rows whose two classes share
# an IDENTICAL score distribution (4k pos + 4k neg per score value =
# heavy ties): by the tie-aware symmetry argument AUC = 0.5 exactly,
# so the distributed rank-sum (distinct-score agg + two-phase prefix
# sum) is pinned to its closed form. (b) FastSS fuzzy self-join over
# digit-DOUBLED hex keys: distinct doubled strings are >= 2 edits
# apart, and a string with one odd run can be completed to a doubled
# string by insertion in exactly one way — so each first-char-deletion
# plant matches its own source and nothing else, and the expected pair
# count is exact ------------------------------------------------------
if jobs & {{"evalfuzzy", "auc"}}:
    from smart_crawler_spark.operators.evalmetrics import roc_auc

    N_SC = int(8_000_000 * scale)
    # label alternates WITHIN each score group ((id//1000)%2, not
    # id%2 — 1000 is even, so id%2 would correlate with the score
    # residue and the closed form would not be 0.5)
    scored = spark.range(N_SC).select(
        ((F.col("id") % 1000) / 1000.0).alias("score"),
        ((F.col("id") / 1000).cast("long") % 2 == 0).alias("label"))
    n, dt_a = timed(lambda: roc_auc(scored, "score", "label"))
    assert n == 1
    row = roc_auc(scored, "score", "label").first()
    assert row["auc"] == 0.5 and row["n_pos"] == N_SC // 2, row
    out["auc"] = {{"rows": N_SC, "sec": round(dt_a, 3),
                   "rows_per_sec": round(N_SC / dt_a)}}

if jobs & {{"evalfuzzy", "fuzzy"}}:
    from smart_crawler_spark.operators.fuzzy import fuzzy_self_join

    N_FZ = int(400_000 * scale)
    dbl = F.regexp_replace(
        F.lpad(F.conv(F.col("id").cast("string"), 10, 16), 12, "0"),
        "(.)", "$1$1")
    base = spark.range(N_FZ).select(
        F.col("id").alias("kid"), dbl.alias("key"))
    plants = base.filter(F.col("kid") % 10 == 0).select(
        (F.col("kid") + 100_000_000).alias("kid"),
        F.col("key").substr(F.lit(2), F.length("key")).alias("key"))
    allk = base.unionByName(plants).localCheckpoint()
    allk.count()
    n_plants = (N_FZ + 9) // 10
    nf, dt_f = timed(lambda: fuzzy_self_join(allk, "key", "kid",
                                             max_dist=1))
    assert nf == n_plants, (nf, n_plants)
    out["fuzzy"] = {{"rows": N_FZ + n_plants, "sec": round(dt_f, 3),
                     "rows_per_sec": round((N_FZ + n_plants) / dt_f),
                     "pairs": nf}}

# --- graph: pointer-jumping redirect resolution over a synthetic
# redirect map (chains up to 12 hops, broken every 13th id) — 4 rounds
# of co-partitioned self-joins on string URL keys, the O(log L)
# frontier-canonicalization kernel -----------------------------------
# --- media: decode-bound map-only kernels — video scene cuts (real
# y4m decode + adjacent-frame MAD per clip) and audio fingerprint
# dedup (WAV decode + sign-sequence md5, fp-only shuffle); both have
# closed-form expected outputs from the plant rules
if "media" in jobs:
    from smart_crawler_spark.datagen.audio import generate_audio
    from smart_crawler_spark.datagen.images import generate_videos
    from smart_crawler_spark.operators.audio import audio_fingerprint_dedup
    from smart_crawler_spark.operators.images import scene_cuts

    N_VID = int(6_000 * scale)
    vids = generate_videos(
        spark, N_VID, n_frames=12, scene_every=4,
        partitions=min(max(N_VID // 16, 1), 512),
    ).localCheckpoint()
    vids.count()
    want_cuts = sum(
        1 for v in range(N_VID) for c in (1, 2) if c * (4 + v % 3) < 12)
    nc, dt_v = timed(lambda: scene_cuts(vids))
    assert nc == want_cuts, (nc, want_cuts)

    N_CLIP = int(40_000 * scale)
    clips = generate_audio(
        spark, N_CLIP, vol_every=8,
        partitions=min(max(N_CLIP // 64, 1), 512),
    ).localCheckpoint()
    clips.count()
    # 25 period classes, every class has many members at this N, so
    # every clip lands in a group of >= 2
    na, dt_a = timed(lambda: audio_fingerprint_dedup(clips))
    assert na == N_CLIP, (na, N_CLIP)
    # separate job keys so the efficiency summary reads each kernel
    out["media_video"] = {{
        "rows": N_VID, "sec": round(dt_v, 3),
        "rows_per_sec": round(N_VID / dt_v), "cuts": nc,
    }}
    out["media_audio"] = {{
        "rows": N_CLIP, "sec": round(dt_a, 3),
        "rows_per_sec": round(N_CLIP / dt_a),
    }}

if "graph" in jobs:
    from smart_crawler_spark.operators.graphops import resolve_redirect_chains
    n_e = int(8_000_000 * scale)
    url = lambda c: F.concat(F.lit("http://h"), (c % 1000).cast("string"),
                             F.lit(".test/p"), c.cast("string"))
    edges = (spark.range(n_e).filter(F.col("id") % 13 != 12)
             .select(url(F.col("id")).alias("src"),
                     url(F.col("id") + 1).alias("dst"))
             .localCheckpoint())
    n_edges = edges.count()
    def run_graph():
        return resolve_redirect_chains(edges, max_chain=16)
    n, dt = timed(run_graph)
    assert n == n_edges, (n, n_edges)
    out["graph"] = {{"rows": n, "sec": round(dt, 3),
                     "rows_per_sec": round(n / dt)}}

print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_level(cpus: int, scale: float, repo: str, jobs: str) -> dict:
    env = dict(os.environ, N_CPUS=str(cpus), SCALE=str(scale), JOBS=jobs)
    proc = subprocess.run(
        [sys.executable, "-c", JOB.format(repo=repo)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT from cpus={cpus}: {proc.stdout[-2000:]} {proc.stderr[-2000:]}"
    )


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def machine_calibration(cpus: list[int]) -> dict:
    """Raw-CPU speedup the box actually delivers between the two levels
    (pure-Python multiprocessing, embarrassingly parallel). On shared/
    SMT hardware this is < ideal; Spark efficiency is reported both
    vs ideal and vs this achievable ceiling."""
    import time
    from concurrent.futures import ProcessPoolExecutor

    out = {}
    for w in cpus:
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            with ProcessPoolExecutor(w) as ex:
                list(ex.map(_burn, [3_000_000] * 64))
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[w] = best
    return out


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpus = [8, 32]
    scale = 1.0
    jobs = "dedup,topk,links,crawl"
    # accept BOTH --flag=value and --flag value; reject anything else
    # (the old =-only parser crashed on the space form and silently ran
    # defaults when values were mistyped)
    args = sys.argv[1:]
    i = 0
    opts: dict[str, str] = {}
    while i < len(args):
        a = args[i]
        if "=" in a:
            k, v = a.split("=", 1)
        elif i + 1 < len(args) and not args[i + 1].startswith("--"):
            k, v = a, args[i + 1]
            i += 1
        else:
            raise SystemExit(f"missing value for {a!r}")
        if k not in ("--cpus", "--scale", "--jobs"):
            raise SystemExit(f"unknown flag {k!r} (use --cpus --scale --jobs)")
        opts[k] = v
        i += 1
    if "--cpus" in opts:
        cpus = [int(x) for x in opts["--cpus"].split(",")]
    if "--scale" in opts:
        scale = float(opts["--scale"])
    if "--jobs" in opts:
        jobs = opts["--jobs"]
    results = {c: run_level(c, scale, repo, jobs) for c in cpus}
    lo, hi = min(cpus), max(cpus)
    ideal = hi / lo
    calib = machine_calibration(cpus)
    machine_speedup = calib[lo] / calib[hi]
    report = {
        "cpus": cpus,
        "scale": scale,
        "jobs": jobs,
        "levels": results,
        "machine": {
            "raw_cpu_speedup": round(machine_speedup, 2),
            "raw_cpu_efficiency": round(machine_speedup / ideal, 3),
        },
        "efficiency": {},
    }
    for job in results[lo]:
        speedup = (
            results[hi][job]["rows_per_sec"] / results[lo][job]["rows_per_sec"]
        )
        report["efficiency"][job] = round(speedup / ideal, 3)
        report["efficiency"][f"{job}_speedup"] = round(speedup, 2)
        report["efficiency"][f"{job}_vs_achievable"] = round(
            speedup / machine_speedup, 3
        )
    line = json.dumps(report)
    print(line)
    with open(os.path.join(repo, "BENCH_SCALING.jsonl"), "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
