"""Cuckoo-filter seen prefilter (frontier/cuckoo.py + SeenFilter
kind='cuckoo'): no false negatives, delete support (the op a bloom
lacks), serialization, and exact-path equivalence through SeenFilter."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from smart_crawler_spark.frontier.cuckoo import CuckooFilter
from smart_crawler_spark.frontier.dedup import BloomConfig, SeenFilter


def _keys(n, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives_and_low_fp_rate():
    f = CuckooFilter(1 << 12)  # 16384 slots
    ins = _keys(10_000)
    f.add(ins)
    assert f.contains(ins).all()  # a prefilter must never drop a member
    other = _keys(100_000, seed=9)
    fp_rate = f.contains(other).mean()
    assert fp_rate < 0.01  # 16-bit fingerprints, 2x4 slots ⇒ ~2^-13 x 8


def test_delete_then_reinsertable():
    f = CuckooFilter(1 << 10)
    ks = _keys(1000, seed=5)
    f.add(ks)
    victims = ks[:100]
    removed = f.delete(victims)
    assert removed.all()
    # full batch minus victims still all present (pigeonhole: deleting a
    # fingerprint copy may shadow a colliding key, but with 1000 keys in
    # 2^10 buckets collisions on (bucket, fp) are ~0 — assert exactly)
    assert f.contains(ks[100:]).all()
    f.add(victims)
    assert f.contains(ks).all()


def test_serialization_roundtrip_and_merge_paths():
    a, b = CuckooFilter(1 << 10), CuckooFilter(1 << 10)
    ka, kb = _keys(500, 1), _keys(500, 2)
    a.add(ka)
    b.add(kb)
    rt = CuckooFilter.from_bytes(a.to_bytes())
    assert rt.contains(ka).all() and rt.n_items == a.n_items
    # manual merge by re-placement mirrors SeenFilter._merge_blooms
    bks, slots = np.nonzero(b.table)
    fps = b.table[bks, slots]
    left = a._bulk_place(bks.astype(np.int64), fps)
    for j in np.nonzero(left)[0]:
        a._insert_with_kicks(int(bks[j]), np.uint16(fps[j]))
    assert a.contains(ka).all() and a.contains(kb).all()


def test_overflow_raises():
    f = CuckooFilter(4)  # 16 slots
    with pytest.raises(RuntimeError, match="over capacity"):
        f.add(_keys(64))


def test_seen_filter_cuckoo_equals_exact(spark):
    """SeenFilter(kind='cuckoo') must produce exactly the exact-path
    result (the prefilter only short-circuits definitely-new keys)."""
    seen_keys = spark.range(0, 20_000).select(
        F.xxhash64("id").alias("url_hash")
    )
    cand = spark.range(10_000, 40_000).select(
        F.col("id").alias("cand_id"), F.xxhash64("id").alias("url_hash")
    )
    want = {
        r["cand_id"]
        for r in cand.join(seen_keys, "url_hash", "left_anti").collect()
    }
    for cfg in (
        BloomConfig(shards=8, kind="cuckoo", cuckoo_buckets=1 << 12),
        # beyond-broadcast threshold forces the cogroup layout
        BloomConfig(shards=8, kind="cuckoo", cuckoo_buckets=1 << 13),
    ):
        sf = SeenFilter(spark, cfg, use_bloom=True)
        if cfg.cuckoo_buckets == 1 << 13:
            sf.BROADCAST_BLOOM_MAX_BYTES = 1  # force cogroup path
        sf.add(seen_keys)
        got = {r["cand_id"] for r in sf.filter_new(cand).collect()}
        assert got == want

def test_alt_bucket_covers_all_bucket_bits():
    """The xor offset must be able to flip EVERY bucket bit (including
    the top one) at the default table size, and stay an involution."""
    from smart_crawler_spark.frontier.cuckoo import _alt_bucket

    n = 1 << 16
    idx = np.zeros(4096, dtype=np.int64)
    fp = np.arange(1, 4097, dtype=np.uint16)
    alt = _alt_bucket(idx, fp, n)
    assert (_alt_bucket(alt, fp, n) == idx).all()  # alt(alt(i)) == i
    assert (alt >= n // 2).any() and (alt < n // 2).any()  # top bit flips
