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
        bucket is not duplicated.

        Bulk path works on a plain Python list-of-lists with scalar int
        arithmetic — per-key numpy allocations made this ~1000x slower
        and dominated whole crawl rounds before."""
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        if h.size == 0:
            return 0
        fps = self._fp(h).tolist()
        i1s = self._i1(h).tolist()
        mask = self.nb - 1
        tbl = self.table.tolist()
        fails = 0
        n = self.n
        for fp, i1 in zip(fps, i1s):
            i2 = i1 ^ ((fp * 0x5BD1E995) & mask)
            row1 = tbl[i1]
            row2 = tbl[i2]
            if fp in row1 or fp in row2:
                n += 1
                continue
            if 0 in row1:
                row1[row1.index(0)] = fp
                n += 1
                continue
            if 0 in row2:
                row2[row2.index(0)] = fp
                n += 1
                continue
            # eviction chain, deterministic victim rotation
            i = i2
            cur = fp
            placed = False
            for kick in range(MAX_KICKS):
                slot = kick % SLOTS
                row = tbl[i]
                victim = row[slot]
                row[slot] = cur
                cur = victim
                i = i ^ ((cur * 0x5BD1E995) & mask)
                row = tbl[i]
                if 0 in row:
                    row[row.index(0)] = cur
                    placed = True
                    break
            if placed:
                n += 1
            else:
                fails += 1
        self.table = np.asarray(tbl, dtype=np.uint16)
        self.n = n
        return fails

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
