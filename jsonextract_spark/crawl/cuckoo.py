"""Cuckoo filter codec for the URL-seen set (north_star's named option).

Standard 4-way bucketed cuckoo filter (Fan et al., CoNLA 2014 — public
algorithm): 16-bit fingerprints, two candidate buckets
``i2 = i1 XOR hash(fp)``, bounded eviction chain. Compared to the Bloom
layer it supports DELETION (needed for recrawl/expiry) at similar space
(~18 bits/key at 95% load).

The table serializes to bytes for the ``seen_filter`` table; incremental
update inserts the round's fresh 64-bit url hashes into the deserialized
table (same pattern as the Bloom OR-merge — we always have the raw
hashes of the delta, so no filter-to-filter merge is needed).

Deterministic: eviction choices derive from a counter, no RNG state.
"""

from __future__ import annotations

import numpy as np

SLOTS = 4
MAX_KICKS = 500
_FP_MIX = np.uint64(0x5BD1E995)


class CuckooFilter:
    def __init__(self, n_buckets: int):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.nb = n_buckets
        self.table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        self.n = 0

    # -- key mapping -------------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.nb - 1)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mixed = (fp.astype(np.uint64) * _FP_MIX) & np.uint64(self.nb - 1)
        return (i.astype(np.uint64) ^ mixed).astype(np.int64)

    # -- operations ---------------------------------------------------------
    def insert_many(self, hashes) -> int:
        """Insert 64-bit hashes; returns number that failed (table full).
        Idempotent-ish: an already-present fingerprint in a candidate
        bucket is not duplicated."""
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        fps = self._fp(h)
        i1s = self._i1(h)
        fails = 0
        for fp, i1 in zip(fps.tolist(), i1s.tolist()):
            if not self._insert_one(np.uint16(fp), i1):
                fails += 1
        return fails

    def _bucket_has(self, i: int, fp) -> bool:
        return bool((self.table[i] == fp).any())

    def _try_put(self, i: int, fp) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def _insert_one(self, fp, i1: int) -> bool:
        i2 = int(self._alt(np.array([i1]), np.array([fp]))[0])
        if self._bucket_has(i1, fp) or self._bucket_has(i2, fp):
            self.n += 1
            return True
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            self.n += 1
            return True
        # eviction chain, deterministic victim rotation
        i = i2
        cur = fp
        for kick in range(MAX_KICKS):
            slot = kick % SLOTS
            victim = self.table[i, slot]
            self.table[i, slot] = cur
            cur = victim
            i = int(self._alt(np.array([i]), np.array([cur]))[0])
            if self._try_put(i, cur):
                self.n += 1
                return True
        return False

    def contains_many(self, hashes) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        fps = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, fps)
        in1 = (self.table[i1] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, hashes) -> int:
        """Remove one matching fingerprint per key; returns #not-found."""
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        fps = self._fp(h)
        i1s = self._i1(h)
        i2s = self._alt(i1s, fps)
        missing = 0
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            for i in (i1, i2):
                idx = np.nonzero(self.table[i] == fp)[0]
                if len(idx):
                    self.table[i, idx[0]] = 0
                    self.n -= 1
                    break
            else:
                missing += 1
        return missing

    # -- serialization ------------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n: int = 0) -> "CuckooFilter":
        arr = np.frombuffer(data, dtype=np.uint16).copy()
        nb = len(arr) // SLOTS
        f = cls(nb)
        f.table = arr.reshape(nb, SLOTS)
        f.n = n
        return f


def sized_for(n_keys: int, load: float = 0.84) -> int:
    """Smallest power-of-two bucket count holding n_keys at target load."""
    need = max(int(n_keys / (SLOTS * load)) + 1, 16)
    nb = 1
    while nb < need:
        nb <<= 1
    return nb
