"""spark-submit entry point: the vision-training-data pipeline over an
image + caption corpus (the image-payload operators as one deployable
job — the multimodal twin of jobs/pipeline_job.py).

Cluster:
    python scripts/package.py
    spark-submit --master <cluster> --py-files dist/smart_crawler_spark.zip \
        jobs/vision_pipeline_job.py --images /data/images \
        --output hdfs:///tmp/vpipe --stages gate,dedup,watermark,shard

Local smoke:
    python jobs/vision_pipeline_job.py --generate 300 \
        --output /tmp/vpipe_job --stages gate,dedup

Input is either ``--images <parquet dir>`` in the input_hint schema
(image_id, bytes, w, h, fmt, caption, phash) or ``--generate N`` for
the deterministic synthetic corpus (with plants for every stage:
JPEG rows, flat banners, byte-identical duplicates, degenerate
captions, decode bombs, watermark logos). Writes one parquet directory
per stage under --output and prints ONE JSON line of per-stage row
counts + wall seconds. Stages:

  verify    per-row decode invariant (dims + phash recompute vs stored)
  gate      the curation funnel, each leg header-only or map-only:
            decode-bomb guard -> resolution/caption gate -> decoded
            quality filter (contrast/entropy); writes the kept ids WITH
            the per-leg verdicts (audit columns, FineWeb-style)
  dedup     exact byte-identical groups + joint image+caption near-dup
            components (phash LSH x caption hash -> survivors)
  boilerplate corpus-frequency caption filter (>=3x repeated captions)
  decon     eval-set decontamination vs a benchmark slice of the corpus
  metadata  embedded-metadata (tEXt) audit + publish-safe strip with a
            pixel-identity proof
  watermark repeated cross-image tile mining (hash-only shuffle)
  patch     8x8 ViT patch table (hash-only rows) + the rebuild
            fingerprint audit per image (shuffle-and-reassemble check)
  augment   hflip/rot90 lossless augmentation (2x corpus fan-out)
  resize    32x24 nearest-neighbor thumbnails (re-encoded PNG)
  shard     byte-budget shard layout over the gate+dedup survivors
            (webdataset-style; survivors only, so the funnel composes)
  export    materialize the survivors as webdataset tar shards
            (sources/webdataset.py; deterministic shard bytes)

Every stage is Arrow-batched mapInPandas / DataFrame aggregation —
no per-row Python UDFs, no driver-side pixel loops; pixels never
shuffle except as the patch/augment output payloads themselves.
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
    p.add_argument("--images", default=None,
                   help="parquet dir in the input_hint schema")
    p.add_argument("--generate", type=int, default=0,
                   help="synthesize N deterministic corpus rows instead")
    p.add_argument("--output", required=True)
    p.add_argument("--stages", default="gate,dedup")
    p.add_argument("--shard-bytes", type=int, default=1 << 20)
    p.add_argument("--master", default=None)
    args = p.parse_args()
    if bool(args.images) == bool(args.generate):
        p.error("exactly one of --images / --generate required")
    stages = set(args.stages.split(","))

    from pyspark.sql import functions as F

    from smart_crawler_spark.operators import images as ops
    from smart_crawler_spark.session import spark_session

    spark = spark_session(app_name="vision-pipeline-job", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    if args.generate:
        from smart_crawler_spark.datagen.images import generate_images

        # cadences chosen pairwise non-colliding: bomb_every=100 would
        # never fire (99 ≡ 24 mod 25 — every bomb index is a dup index
        # and the dup redirect wins), so bombs land on the 90 cadence
        corpus = generate_images(
            spark, args.generate, jpeg_every=10, flat_every=50,
            dup_every=25, short_caption_every=40, bomb_every=90,
            logo_every=7, text_meta_every=3,
        )
        # datagen is a mapInPandas source; materialize once so every
        # stage reads parquet instead of re-encoding the corpus
        src = os.path.join(args.output, "_corpus")
        corpus.write.mode("overwrite").parquet(src)
        corpus = spark.read.parquet(src)
    else:
        corpus = spark.read.parquet(args.images)
    report: dict = {"stages": {}}

    def run(name: str, df_factory):
        t0 = time.monotonic()
        dest = os.path.join(args.output, name)
        df_factory().write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        report["stages"][name] = {
            "rows": n, "sec": round(time.monotonic() - t0, 3), "path": dest,
        }

    def gated():
        """The curation funnel: bomb guard -> header/caption gate ->
        decoded quality filter, with per-leg audit columns. Bomb-guard
        keeps gate the DECODE itself (flagged payloads are never
        decoded downstream)."""
        guard = ops.decode_bomb_guard(corpus).select(
            "image_id", F.col("keep").alias("bomb_ok")
        )
        cap = ops.caption_gate(corpus).select(
            "image_id", F.col("keep").alias("caption_ok")
        )
        safe = corpus.join(
            guard.filter("bomb_ok").select("image_id"), "image_id"
        )
        qual = ops.image_quality_stats(safe).select(
            "image_id", F.col("keep").alias("quality_ok")
        )
        return (
            guard.join(cap, "image_id")
            .join(qual, "image_id", "left")
            .select(
                "image_id", "bomb_ok", "caption_ok",
                F.coalesce("quality_ok", F.lit(False)).alias("quality_ok"),
                (
                    F.col("bomb_ok") & F.col("caption_ok")
                    & F.coalesce("quality_ok", F.lit(False))
                ).alias("keep"),
            )
        )

    if "verify" in stages:
        run("verify", lambda: ops.verify_decode_invariant(corpus))

    if "gate" in stages:
        run("gate", gated)

    if "dedup" in stages:
        run("exact_groups", lambda: ops.exact_dup_groups(corpus))
        run("joint_components", lambda: ops.joint_dup_groups(corpus))

    if "boilerplate" in stages:
        # corpus-frequency caption filter: the planted 'thumb' captions
        # are the only >=3x repeats in the generated corpus
        run("boilerplate", lambda: ops.caption_boilerplate(
            corpus, min_images=3))

    if "decon" in stages:
        # eval-set decontamination: the benchmark here is a slice of
        # the corpus itself (every 25th content index, offset 3 — a
        # residue no other plant cadence hits), so the flagged set is
        # exactly the slice via the byte-exact path
        def _decon():
            bench = corpus.filter(
                F.expr("CAST(substring(image_id, 4) AS INT) % 25 = 3")
            )
            return ops.benchmark_image_contamination(
                corpus, bench, max_hamming=4
            )

        run("decon", _decon)

    if "metadata" in stages:
        # EXIF/PII sweep: audit every embedded tEXt entry, then strip
        # ancillary chunks with a decode-both pixel-identity proof
        run("metadata_audit", lambda: ops.metadata_audit(corpus))
        run("metadata_strip", lambda: ops.strip_metadata_verify(corpus))

    if "watermark" in stages:
        run("watermark", lambda: ops.watermark_patches(
            corpus, patch=8, min_images=5))

    if "patch" in stages:
        run("patches", lambda: ops.extract_patches(
            corpus, patch=8, with_bytes=False))
        run("patch_audit", lambda: ops.reassemble_verify(corpus, patch=8))

    if "augment" in stages:
        run("augment", lambda: ops.augment_images(
            corpus, augs=("hflip", "rot90")))

    if "resize" in stages:
        run("thumbs", lambda: ops.resize_images(corpus, 32, 24))

    if "shard" in stages:
        # the funnel composes: shard only the gate survivors that are
        # also their dedup group's canonical representative
        def _shard():
            kept = gated().filter("keep").select("image_id")
            reps = (
                ops.exact_dup_groups(corpus)
                .filter(F.col("image_id") == F.col("group_rep"))
                .select("image_id")
            )
            survivors = corpus.join(kept, "image_id").join(reps, "image_id")
            return ops.shard_pack(
                survivors, shard_bytes=args.shard_bytes,
                size_col=None, id_col="image_id",
            )

        run("shards", _shard)

    if "export" in stages:
        # materialize the survivors as webdataset tar shards — the
        # format vision loaders stream; shard bytes are deterministic
        # (layout + tar metadata pinned), so re-runs are idempotent
        from smart_crawler_spark.sources.webdataset import (
            write_webdataset_shards,
        )

        def _export():
            kept = gated().filter("keep").select("image_id")
            reps = (
                ops.exact_dup_groups(corpus)
                .filter(F.col("image_id") == F.col("group_rep"))
                .select("image_id")
            )
            survivors = corpus.join(kept, "image_id").join(reps, "image_id")
            return write_webdataset_shards(
                survivors, shard_bytes=args.shard_bytes
            )

        run("export", _export)

    report["sec"] = round(
        sum(s["sec"] for s in report["stages"].values()), 3
    )
    spark.stop()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
