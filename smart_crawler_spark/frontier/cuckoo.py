"""Cuckoo-filter seen-set prefilter (north_rule: "bloom/cuckoo URL-seen
filter built with vectorized Arrow UDFs over canonicalized+hashed URLs").

Why a cuckoo filter next to the bloom (frontier/dedup.py): same
no-false-negative prefilter contract, but it also supports DELETE —
the operation a recrawl scheduler needs when a URL's entry expires and
it must become fetchable again; a bloom can only grow. Fingerprints are
16-bit, buckets hold 4 slots, two candidate buckets per key
(partial-key cuckoo hashing, Fan et al., CoNEXT'14 — public algorithm).

Everything is numpy over whole key batches:
- probe: gather both candidate buckets for every key at once and
  compare against fingerprints — zero Python per key;
- insert: bulk pass fills primary buckets via sorted slot assignment,
  spillover retries the alternate bucket the same way; only the rare
  overflow tail (load > ~0.95 per bucket pair) walks the classic
  eviction loop.

The table serializes to bytes, so it ships exactly like the bloom
bitmaps: per-shard rows in a DataFrame or one dense broadcast matrix
probed inside a pandas UDF (SeenFilter wiring in dedup.py).
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    """Non-zero 16-bit fingerprints from 64-bit keys (0 marks empty)."""
    fp = ((keys >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    # avoid the reserved empty value without branching per key
    return np.where(fp == 0, np.uint16(0x5BD1), fp)


def _alt_bucket(idx: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """i2 = i1 xor h(fp) — reduced BEFORE the xor so it stays closed in
    [0, n_buckets) (power of two), making alt(alt(i)) == i exactly.
    The offset keeps the top log2(n_buckets) bits of the multiply so
    EVERY bucket bit can differ between the two candidates — a fixed
    short shift would pin the high bucket bits together at large table
    sizes, collapsing bucket-pair diversity and raising kick failures."""
    bits = max(n_buckets.bit_length() - 1, 1)
    h = (fp.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(
        64 - bits
    )
    return idx ^ (h.astype(np.int64) & (n_buckets - 1))


class CuckooFilter:
    """Batch-oriented cuckoo filter over uint64 keys."""

    def __init__(self, n_buckets: int = 1 << 16):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.n_items = 0

    # -- serialization (per-shard blob, like the bloom bitmaps) --------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        arr = np.frombuffer(data, dtype=np.uint16).copy()
        n_buckets = len(arr) // _SLOTS
        f = cls(n_buckets)
        f.table = arr.reshape(n_buckets, _SLOTS)
        f.n_items = int((f.table != 0).sum())
        return f

    # -- bulk ops -------------------------------------------------------
    def _bulk_place(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Try to place (idx, fp) pairs into their bucket's free slots,
        vectorized: sort by bucket, give each pair a rank within its
        bucket, and accept ranks that fit the remaining free slots.
        Returns the boolean mask of UNplaced pairs."""
        if len(idx) == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(idx, kind="stable")
        sidx = idx[order]
        # rank of each pair within its bucket group
        first = np.r_[True, sidx[1:] != sidx[:-1]]
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(sidx)), 0))
        rank = np.arange(len(sidx)) - group_start
        free = _SLOTS - (self.table[sidx] != 0).sum(axis=1)
        fits = rank < free
        # write accepted fingerprints into the first free slots
        acc_idx, acc_fp, acc_rank = sidx[fits], fp[order][fits], rank[fits]
        occ = (self.table[acc_idx] != 0).sum(axis=1)
        self.table[acc_idx, occ + acc_rank] = acc_fp
        unplaced = np.zeros(len(idx), dtype=bool)
        unplaced[order[~fits]] = True
        self.n_items += int(fits.sum())
        return unplaced

    def add(self, keys: np.ndarray) -> None:
        """Insert a batch of uint64 keys (duplicates allowed — a seen
        filter inserts each key once by construction upstream)."""
        keys = keys.astype(np.uint64)
        fp = _fingerprints(keys)
        i1 = (keys % np.uint64(self.n_buckets)).astype(np.int64)
        left = self._bulk_place(i1, fp)
        if left.any():
            i2 = _alt_bucket(i1[left], fp[left], self.n_buckets)
            fp2 = fp[left]
            left2 = self._bulk_place(i2, fp2)
            for j in np.nonzero(left2)[0]:
                self._insert_with_kicks(int(i2[j]), np.uint16(fp2[j]))

    def _insert_with_kicks(self, idx: int, f: np.uint16) -> None:
        rng = np.random.Generator(np.random.PCG64(int(f) * 2654435761 + idx))
        for _ in range(_MAX_KICKS):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                self.n_items += 1
                return
            slot = int(rng.integers(0, _SLOTS))
            f, row[slot] = row[slot], f
            idx = int(
                _alt_bucket(np.array([idx]), np.array([f], dtype=np.uint16),
                            self.n_buckets)[0]
            )
        raise RuntimeError(
            "cuckoo filter over capacity — size the shards so the load "
            "factor stays below ~0.95 (like bloom bits_per_shard)"
        )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: (n,) bool — no false negatives."""
        keys = keys.astype(np.uint64)
        fp = _fingerprints(keys)
        i1 = (keys % np.uint64(self.n_buckets)).astype(np.int64)
        i2 = _alt_bucket(i1, fp, self.n_buckets)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one fingerprint copy per present key (the op a bloom
        cannot do); returns the mask of keys actually removed.

        PRECONDITION: only delete keys that were actually inserted (the
        standard cuckoo-filter contract, Fan et al. §3.3). Deleting a
        never-inserted key whose fingerprint collides with another key's
        silently removes that other key's entry — a false NEGATIVE,
        breaking the prefilter contract SeenFilter relies on. The
        recrawl-expiry path satisfies this by construction: it only
        feeds back keys previously added via SeenFilter.add."""
        keys = keys.astype(np.uint64)
        fp = _fingerprints(keys)
        i1 = (keys % np.uint64(self.n_buckets)).astype(np.int64)
        i2 = _alt_bucket(i1, fp, self.n_buckets)
        removed = np.zeros(len(keys), dtype=bool)
        for j in range(len(keys)):  # deletion is the rare maintenance op
            for b in (int(i1[j]), int(i2[j])):
                slots = np.nonzero(self.table[b] == fp[j])[0]
                if len(slots):
                    self.table[b, slots[0]] = 0
                    # compact: bulk insertion assumes free slots sit at
                    # the END of a bucket (occupancy + rank addressing)
                    row = self.table[b]
                    live = row[row != 0]
                    row[:] = 0
                    row[: len(live)] = live
                    self.n_items -= 1
                    removed[j] = True
                    break
        return removed
