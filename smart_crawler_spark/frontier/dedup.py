"""URL-seen dedup filter (SURVEY §2.2 F1) — the crawl's hottest operator.

Reference semantics: dedup happens at *enqueue* time against a per-site
visited set of SHA-1(relative URL) (``CrawlQueue.java:81-100,206-217``).

Scale design (north_rule: bloom/cuckoo URL-seen over canonicalized+hashed
URLs, sharded so each partition owns its slice):

1. **Exact layer** — the seen set is a table of ``(url_hash: long,
   shard: int)`` hash-partitioned by ``shard = pmod(url_hash, P)``.
   New candidates are deduped with a ``left_anti`` join on ``url_hash``
   after repartitioning both sides by ``shard``; at 10^10 keys this is a
   co-partitioned shuffle-hash join, never a broadcast.
2. **Approximate prefilter** — each shard owns a bloom bitmap (numpy
   bitarray built/merged in Arrow-batched ``applyInPandas``; k hash
   probes derived from the 64-bit key by splitmix mixing, so no second
   pass over the URL strings). Rows the bloom says "definitely new" are
   new with NO exact join; only the "possibly seen" fraction (+ false
   positives) reaches the exact anti-join. Two probe layouts:

   - **broadcast** (total bitmap <= 64 MB): all shards collected into
     one dense matrix shipped in a scalar pandas UDF closure — probing
     is shuffle-free, one numpy pass per Arrow batch.
   - **cogroup** (beyond): candidates are cogrouped with the bitmap
     table per shard, each partition probing only its own slice — the
     10^10-key layout where no single bitmap fits anywhere.

Everything is vectorized: hashing is JVM ``xxhash64``; bloom probes are
numpy bit ops over whole Arrow batches (no per-row Python).

At rest the seen table should be *bucketed* by its join key so the
exact layer's anti-join needs no Exchange on the seen side at all —
``sources/bucketed.py`` provides that layout (Iceberg's
``bucket(N, key)`` transform on a real cluster) and
``tests/test_bucketed.py`` pins the no-Exchange plan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BLOOM_SCHEMA = StructType(
    [StructField("shard", IntegerType()), StructField("bitmap", BinaryType())]
)

_CAND_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("url_hash", LongType()),
        StructField("maybe_seen", IntegerType()),
    ]
)


def _splitmix_probes(keys: np.ndarray, k: int, nbits: int) -> np.ndarray:
    """k bloom bit positions per 64-bit key, fully vectorized.

    splitmix64 finalizer applied k times with distinct increments — each
    round is a few multiplies/xors over the whole batch.
    """
    out = np.empty((k, len(keys)), dtype=np.uint64)
    z = keys.astype(np.uint64)
    # increments precomputed with Python ints (wraparound explicit) —
    # a NumPy scalar multiply here overflows with a RuntimeWarning per
    # probe call, drowning out real warnings in the hottest operator
    incs = [
        np.uint64(((i + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        for i in range(k)
    ]
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        for i in range(k):
            x = z + incs[i]
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
            out[i] = x % np.uint64(nbits)
    return out


def _set_bits(bitmap: np.ndarray, positions: np.ndarray) -> None:
    np.bitwise_or.at(bitmap, positions >> np.uint64(3),
                     np.left_shift(np.uint8(1), (positions & np.uint64(7)).astype(np.uint8)))


def _test_bits(bitmap: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """(k, n) positions -> (n,) bool: all k bits set."""
    bytes_ = bitmap[(positions >> np.uint64(3)).astype(np.int64)]
    masks = np.left_shift(np.uint8(1), (positions & np.uint64(7)).astype(np.uint8))
    return ((bytes_ & masks) != 0).all(axis=0)


@dataclass
class BloomConfig:
    shards: int = 64
    bits_per_shard: int = 1 << 20  # 128 KiB/shard; size for expected keys/shard
    num_hashes: int = 5
    # prefilter layout: "bloom" (dense bitmap, OR-mergeable, grow-only)
    # or "cuckoo" (fingerprint table, frontier/cuckoo.py — supports
    # DELETE for recrawl-expiry semantics; merge = fingerprint re-place)
    kind: str = "bloom"
    cuckoo_buckets: int = 1 << 15  # 4 slots each → ~124k keys/shard @0.95

    def blob_bytes(self) -> int:
        if self.kind == "cuckoo":
            return self.cuckoo_buckets * 4 * 2  # slots × uint16
        return self.bits_per_shard // 8


def _bloom_probe(blob: bytes, keys: np.ndarray, cfg: "BloomConfig") -> np.ndarray:
    bitmap = np.frombuffer(blob, dtype=np.uint8)
    pos = _splitmix_probes(keys, cfg.num_hashes, cfg.bits_per_shard)
    return _test_bits(bitmap, pos)


def _cuckoo_probe(blob: bytes, keys: np.ndarray, cfg: "BloomConfig") -> np.ndarray:
    from smart_crawler_spark.frontier.cuckoo import CuckooFilter

    return CuckooFilter.from_bytes(blob).contains(keys)


def _probe_fn(cfg: "BloomConfig"):
    return _cuckoo_probe if cfg.kind == "cuckoo" else _bloom_probe


class SeenFilter:
    """Sharded seen-set with exact anti-join + per-shard bloom prefilter."""

    def __init__(
        self,
        spark,
        cfg: BloomConfig | None = None,
        use_bloom: bool = True,
        lazy: bool = False,
    ):
        self.spark = spark
        self.cfg = cfg or BloomConfig()
        self.use_bloom = use_bloom
        # lazy=True defers ALL bitmap maintenance until activate_blooms()
        # — the engine's auto mode runs whole crawls on the exact path
        # without ever paying the per-round build/merge (measured 119 s
        # of pure waste at 10^8 keys when bitmaps are maintained but
        # never probed); the first crossover trip builds once from the
        # seen table and switches to incremental maintenance.
        self.lazy = lazy
        self.seen: DataFrame = spark.createDataFrame(
            [], "url_hash long, shard int"
        )
        self.blooms: DataFrame | None = None
        self._dense_cache = None  # Broadcast[(bitmaps, has_bitmap)]

    # -- shard helpers -------------------------------------------------
    def _with_shard(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        return df.withColumn(
            "shard", F.pmod(F.col(hash_col), F.lit(self.cfg.shards)).cast("int")
        )

    # -- bloom build/merge ---------------------------------------------
    def _build_blooms(self, hashes: DataFrame) -> DataFrame:
        cfg = self.cfg

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            keys = pdf["url_hash"].to_numpy()
            if cfg.kind == "cuckoo":
                from smart_crawler_spark.frontier.cuckoo import CuckooFilter

                f = CuckooFilter(cfg.cuckoo_buckets)
                f.add(keys.astype(np.uint64))
                blob = f.to_bytes()
            else:
                bitmap = np.zeros(cfg.bits_per_shard // 8, dtype=np.uint8)
                pos = _splitmix_probes(keys, cfg.num_hashes, cfg.bits_per_shard)
                _set_bits(bitmap, pos.ravel())
                blob = bitmap.tobytes()
            return pd.DataFrame(
                {"shard": [int(pdf["shard"].iloc[0])], "bitmap": [blob]}
            )

        return hashes.groupBy("shard").applyInPandas(build, BLOOM_SCHEMA)

    def _merge_blooms(self, new_blooms: DataFrame) -> DataFrame:
        if self.blooms is None:
            return new_blooms
        cfg = self.cfg

        def merge(_key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            blobs = list(left["bitmap"]) + list(right["bitmap"])
            if cfg.kind == "cuckoo":
                from smart_crawler_spark.frontier.cuckoo import CuckooFilter

                base = CuckooFilter.from_bytes(blobs[0])
                for b in blobs[1:]:
                    other = CuckooFilter.from_bytes(b)
                    bks, slots = np.nonzero(other.table)
                    fps = other.table[bks, slots]
                    # re-place entries at their stored bucket (valid:
                    # bucket pairs are symmetric under _alt_bucket)
                    left_mask = base._bulk_place(bks.astype(np.int64), fps)
                    for j in np.nonzero(left_mask)[0]:
                        base._insert_with_kicks(int(bks[j]), np.uint16(fps[j]))
                out_blob = base.to_bytes()
            else:
                maps = [np.frombuffer(b, dtype=np.uint8) for b in blobs]
                out = maps[0].copy()
                for m in maps[1:]:
                    out |= m
                out_blob = out.tobytes()
            return pd.DataFrame({"shard": [int(_key[0])], "bitmap": [out_blob]})

        return (
            self.blooms.groupBy("shard")
            .cogroup(new_blooms.groupBy("shard"))
            .applyInPandas(merge, BLOOM_SCHEMA)
        )

    # -- the operator ---------------------------------------------------
    # bitmap bytes up to this total are probed via a broadcast single
    # bitmap (no shuffle); beyond it, the sharded cogroup path owns one
    # bitmap slice per partition (the 10^10-key layout)
    BROADCAST_BLOOM_MAX_BYTES = 64 << 20

    def filter_new(
        self,
        candidates: DataFrame,
        hash_col: str = "url_hash",
        prefer_bloom: bool | None = None,
    ) -> DataFrame:
        """Return candidates whose url_hash is not in the seen set.

        Candidates may contain intra-batch duplicates; the caller dedups
        those (they need priority-aware resolution, not hash dropping).

        ``prefer_bloom=False`` forces the exact anti-join for this call
        even when bitmaps exist — the engine's auto mode measures that
        the bloom prefilter only wins when |seen| >> |candidates|
        (BASELINE.md crossover) and picks per round.
        """
        cand = self._with_shard(candidates, hash_col)
        use_bloom = self.use_bloom if prefer_bloom is None else (
            self.use_bloom and prefer_bloom
        )
        if not use_bloom or self.blooms is None:
            return cand.join(self.seen, ["shard", "url_hash"], "left_anti").drop("shard")

        total_bytes = self.cfg.shards * self.cfg.blob_bytes()
        if total_bytes <= self.BROADCAST_BLOOM_MAX_BYTES:
            return self._filter_new_broadcast(cand)

        cfg = self.cfg
        probe_fn = _probe_fn(cfg)

        def probe(_key, cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
            keys = cand_pdf["url_hash"].to_numpy()
            if bloom_pdf.empty:
                # a shard with NO bitmap must fall through to the exact
                # anti-join (maybe=1): if the shard truly has no seen
                # keys that join is free, and if the bitmap is missing
                # for any other reason (e.g. shard-count mismatch),
                # answering "definitely new" would be a FALSE NEGATIVE —
                # the one error class a seen prefilter must never make
                maybe = np.ones(len(keys), dtype=np.int32)
            else:
                maybe = probe_fn(
                    bloom_pdf["bitmap"].iloc[0], keys.astype(np.uint64), cfg
                ).astype(np.int32)
            return pd.DataFrame(
                {"shard": cand_pdf["shard"], "url_hash": keys, "maybe_seen": maybe}
            )

        flags = (
            cand.select("shard", "url_hash")
            .groupBy("shard")
            .cogroup(self.blooms.groupBy("shard"))
            .applyInPandas(probe, _CAND_SCHEMA)
        )
        cand = cand.join(flags.dropDuplicates(["shard", "url_hash"]),
                         ["shard", "url_hash"], "left")
        definitely_new = cand.filter(F.col("maybe_seen") == 0).drop("maybe_seen", "shard")
        maybe_seen = cand.filter(F.col("maybe_seen") == 1).drop("maybe_seen")
        confirmed_new = maybe_seen.join(
            self.seen, ["shard", "url_hash"], "left_anti"
        ).drop("shard")
        return definitely_new.unionByName(confirmed_new)

    def _filter_new_broadcast(self, cand: DataFrame) -> DataFrame:
        """Shuffle-free bloom prefilter: collect the (small) per-shard
        bitmaps once, ship them in the UDF closure (Spark broadcasts
        with the task), probe each Arrow batch with numpy bit ops, and
        send only the maybe-seen fraction to the exact anti-join."""
        from pyspark.sql.functions import pandas_udf

        cfg = self.cfg
        if self._dense_cache is None:
            # one dense (shards, bytes) matrix: probe indexes rows by
            # shard; a Spark broadcast variable ships it once per
            # executor (a closure copy would ship per TASK)
            dense = np.zeros((cfg.shards, cfg.blob_bytes()), dtype=np.uint8)
            # a shard with NO bitmap row must answer "maybe seen", never
            # "definitely new" (the one error class a seen prefilter can
            # never make — same contract as the cogroup probe's
            # missing-bitmap fallthrough); an all-zero row would answer
            # "definitely new" for every key in that shard
            has_bitmap = np.zeros(cfg.shards, dtype=bool)
            for r in self.blooms.collect():
                dense[int(r["shard"])] = np.frombuffer(
                    r["bitmap"], dtype=np.uint8
                )
                has_bitmap[int(r["shard"])] = True
            self._dense_cache = self.spark.sparkContext.broadcast(
                (dense, has_bitmap)
            )
        bc = self._dense_cache

        if cfg.kind == "cuckoo":

            @pandas_udf("boolean")
            def maybe_seen(shard: pd.Series, keys: pd.Series) -> pd.Series:
                from smart_crawler_spark.frontier.cuckoo import CuckooFilter

                dense, has_bitmap = bc.value
                sh = shard.to_numpy(dtype=np.int64)
                ks = keys.to_numpy().astype(np.uint64)
                hit = np.zeros(len(ks), dtype=bool)
                for s in np.unique(sh):  # <= cfg.shards groups per batch
                    m = sh == s
                    if not has_bitmap[s]:
                        hit[m] = True  # no bitmap -> exact join decides
                        continue
                    hit[m] = CuckooFilter.from_bytes(
                        dense[s].tobytes()
                    ).contains(ks[m])
                return pd.Series(hit)

        else:

            @pandas_udf("boolean")
            def maybe_seen(shard: pd.Series, keys: pd.Series) -> pd.Series:
                dense, has_bitmap = bc.value
                sh = shard.to_numpy(dtype=np.int64)
                ks = keys.to_numpy().astype(np.uint64)
                pos = _splitmix_probes(ks, cfg.num_hashes, cfg.bits_per_shard)
                byte_idx = (pos >> np.uint64(3)).astype(np.int64)
                masks = np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                )
                hit = np.ones(len(ks), dtype=bool)
                for k in range(cfg.num_hashes):
                    hit &= (dense[sh, byte_idx[k]] & masks[k]) != 0
                hit[~has_bitmap[sh]] = True  # no bitmap -> exact join
                return pd.Series(hit)

        flagged = cand.withColumn(
            "_maybe", maybe_seen(F.col("shard"), F.col("url_hash"))
        )
        definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe", "shard")
        confirmed_new = (
            flagged.filter(F.col("_maybe"))
            .drop("_maybe")
            .join(self.seen, ["shard", "url_hash"], "left_anti")
            .drop("shard")
        )
        return definitely_new.unionByName(confirmed_new)

    def add(self, new_hashes: DataFrame, hash_col: str = "url_hash") -> None:
        """Record hashes as seen (call with the batch actually enqueued).

        Idempotent: already-seen keys are dropped so the seen table stays
        a set (redirect targets may be re-added, E8)."""
        fresh = self._with_shard(
            new_hashes.select(F.col(hash_col).alias("url_hash")).distinct()
        ).join(self.seen, ["shard", "url_hash"], "left_anti")
        self.seen = self.seen.unionByName(fresh.select("url_hash", "shard"))
        if self.use_bloom and not self.lazy:
            self.blooms = self._merge_blooms(self._build_blooms(fresh))
            if self._dense_cache is not None:
                self._dense_cache.unpersist()
                self._dense_cache = None

    def remove(self, hashes: DataFrame, hash_col: str = "url_hash") -> None:
        """Delete hashes from the seen set — F1's inverse, the
        recrawl-expiry maintenance op. The exact table drops rows via
        the co-partitioned (shard, url_hash) anti-join; active CUCKOO
        shards delete the fingerprints in place (CuckooFilter.delete —
        the capability this layout exists for; the caller feeds back
        only previously-added keys, satisfying the deletion
        precondition); BLOOM bitmaps cannot unset bits, so they are
        rebuilt from the surviving seen table (grow-only layouts pay a
        full rebuild per expiry wave — use kind='cuckoo' for recrawl
        deployments)."""
        gone = self._with_shard(
            hashes.select(F.col(hash_col).alias("url_hash")).distinct()
        ).localCheckpoint(eager=True)
        self.seen = self.seen.join(gone, ["shard", "url_hash"], "left_anti")
        if self.blooms is None:
            return
        if self.cfg.kind == "cuckoo":
            def delete(_key, bloom_pdf: pd.DataFrame, gone_pdf: pd.DataFrame) -> pd.DataFrame:
                if bloom_pdf.empty:
                    # no bitmap for this shard: nothing to delete from
                    # (filter_new fails safe to the exact join there)
                    return pd.DataFrame({"shard": [], "bitmap": []})
                from smart_crawler_spark.frontier.cuckoo import CuckooFilter

                blob = bloom_pdf["bitmap"].iloc[0]
                if gone_pdf.empty:
                    return pd.DataFrame(
                        {"shard": [int(_key[0])], "bitmap": [blob]}
                    )
                f = CuckooFilter.from_bytes(blob)
                f.delete(gone_pdf["url_hash"].to_numpy().astype(np.uint64))
                return pd.DataFrame(
                    {"shard": [int(_key[0])], "bitmap": [f.to_bytes()]}
                )

            self.blooms = (
                self.blooms.groupBy("shard")
                .cogroup(gone.groupBy("shard"))
                .applyInPandas(delete, BLOOM_SCHEMA)
            )
        else:
            self.blooms = self._build_blooms(self.seen)
        if self._dense_cache is not None:
            self._dense_cache.unpersist()
            self._dense_cache = None

    def activate_blooms(self) -> None:
        """Build the per-shard bitmaps ONCE from the current seen table
        and switch from lazy to incremental maintenance. No-op unless
        lazy. The build is the same bulk groupBy-per-shard path the
        10^8-key benchmark exercises; subsequent add() calls merge
        incrementally as usual."""
        if not self.lazy:
            return
        self.lazy = False
        self.blooms = self._build_blooms(self.seen).localCheckpoint(eager=True)
        if self._dense_cache is not None:
            self._dense_cache.unpersist()
            self._dense_cache = None

    def materialize(self) -> None:
        """Cut lineage (call per crawl round; checkpointing persists instead)."""
        for job in self.materialize_jobs():
            job()

    def materialize_jobs(self) -> list:
        """The materialize step as independent thunks (one per state
        table) so an iterative caller can run them in its round-tail
        thread pool instead of serializing two eager checkpoints —
        seen and bitmaps depend only on the already-checkpointed round
        input, never on each other."""

        def _seen():
            self.seen = self.seen.localCheckpoint(eager=True)

        jobs = [_seen]
        if self.blooms is not None:

            def _blooms():
                self.blooms = self.blooms.localCheckpoint(eager=True)

            jobs.append(_blooms)
        return jobs


def dedup_new_urls(
    new_urls: DataFrame, seen: DataFrame, hash_col: str = "url_hash"
) -> DataFrame:
    """Stateless exact-layer dedup: one left_anti join (for queries()/tests)."""
    return new_urls.join(seen.select(hash_col).distinct(), [hash_col], "left_anti")
