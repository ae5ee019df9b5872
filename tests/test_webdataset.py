"""WebDataset tar-shard sink/reader (sources/webdataset.py)."""

import hashlib
import io
import tarfile

from smart_crawler_spark.datagen.images import generate_images
from smart_crawler_spark.sources.webdataset import (
    webdataset_records,
    webdataset_roundtrip_check,
    write_webdataset_shards,
)


def test_shard_bytes_deterministic_under_partitioning(spark):
    corpus = generate_images(spark, 60, jpeg_every=10)
    a = {
        r["shard_id"]: bytes(r["bytes"])
        for r in write_webdataset_shards(corpus, 32 * 1024).collect()
    }
    b = {
        r["shard_id"]: bytes(r["bytes"])
        for r in write_webdataset_shards(
            corpus.repartition(7, "caption"), 32 * 1024
        ).collect()
    }
    assert a == b and len(a) >= 2


def test_budget_and_member_layout(spark):
    corpus = generate_images(spark, 60, jpeg_every=10)
    sizes = {
        r["image_id"]: len(bytes(r["bytes"])) for r in corpus.collect()
    }
    budget = 32 * 1024
    shards = write_webdataset_shards(corpus, budget).collect()
    assert sum(r["n_samples"] for r in shards) == 60
    for r in shards:
        with tarfile.open(
            fileobj=io.BytesIO(bytes(r["bytes"])), mode="r"
        ) as tf:
            names = [m.name for m in tf.getmembers()]
        # pairs: every image member immediately followed by its caption
        stems = [n.rsplit(".", 1)[0] for n in names]
        assert stems[::2] == stems[1::2]
        assert all(n.endswith(".txt") for n in names[1::2])
        payload = sum(sizes[s] for s in stems[::2])
        # start-offset assignment: overflow bounded by one asset
        assert payload <= budget + max(sizes.values())


def test_reader_md5_and_damaged_shard(spark):
    corpus = generate_images(spark, 20, jpeg_every=10)
    want = {
        r["image_id"]: hashlib.md5(bytes(r["bytes"])).hexdigest()
        for r in corpus.collect()
    }
    shards = write_webdataset_shards(corpus, 16 * 1024)
    rows = webdataset_records(shards).collect()
    got = {
        r["member"].rsplit(".", 1)[0]: r["payload_md5"]
        for r in rows
        if not r["member"].endswith(".txt")
    }
    assert got == want

    first = shards.collect()[0]
    dmg = spark.createDataFrame(
        [(99, bytearray(bytes(first["bytes"])[:100]))],
        "shard_id long, bytes binary",
    )
    (err_row,) = webdataset_records(dmg).collect()
    assert err_row["err"] and err_row["member"] is None


def test_roundtrip_check_green_and_corruption_flags_false(spark):
    import pyspark.sql.functions as F

    corpus = generate_images(spark, 30, jpeg_every=10)
    ok = webdataset_roundtrip_check(corpus, 16 * 1024).collect()
    assert len(ok) == 30
    assert all(r["img_ok"] and r["caption_ok"] for r in ok)

    # truncate one shard: its samples' members vanish from the reader,
    # and the check must report FALSE (never null) for exactly them
    shards = write_webdataset_shards(corpus, 16 * 1024)
    rows = shards.collect()
    lost_stems = set()
    with tarfile.open(
        fileobj=io.BytesIO(bytes(rows[0]["bytes"])), mode="r"
    ) as tf:
        lost_stems = {
            m.name.rsplit(".", 1)[0] for m in tf.getmembers()
        }
    doctored = spark.createDataFrame(
        [
            (
                r["shard_id"],
                bytearray(
                    bytes(r["bytes"])[:100]
                    if i == 0
                    else bytes(r["bytes"])
                ),
            )
            for i, r in enumerate(rows)
        ],
        "shard_id long, bytes binary",
    )
    members = webdataset_records(doctored).filter(F.col("err").isNull())
    stem = F.regexp_replace("member", r"\.[a-z]+$", "")
    is_txt = F.col("member").endswith(".txt")
    got = members.groupBy(stem.alias("image_id")).agg(
        F.max(F.when(~is_txt, F.col("payload_md5"))).alias("img_md5"),
    )
    want = corpus.select("image_id", F.md5("bytes").alias("want_img"))
    verdicts = {
        r["image_id"]: r["ok"]
        for r in want.join(got, "image_id", "left")
        .select(
            "image_id",
            F.coalesce(
                F.col("img_md5") == F.col("want_img"), F.lit(False)
            ).alias("ok"),
        )
        .collect()
    }
    assert lost_stems and all(
        verdicts[s] is False for s in lost_stems
    )
    assert all(
        v is True for k, v in verdicts.items() if k not in lost_stems
    )
