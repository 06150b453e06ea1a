"""Cuckoo filter — memory-bounded fast-path membership for the URL-seen set.

Standard partial-key cuckoo hashing (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT 2014 — public algorithm): 4-slot buckets, 16-bit
fingerprints, displacement via fp-hash XOR.  At 10^10 URLs the exact per-shard
hash sets are the source of truth on disk; the in-memory cuckoo filter answers
"definitely new" without touching the exact set (SURVEY.md §2.3 T4, north
rule).  False-positive rate ≈ 2^-13 per lookup at 95% load.

Pure Python + array module (no numpy needed on the actor hot path; inserts
and lookups are O(1) with tiny constants)."""

from __future__ import annotations

from array import array
from hashlib import blake2b

_EMPTY = 0


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, max_kicks: int = 500):
        # round buckets up to a power of two
        nb = 1
        while nb * 4 < capacity:
            nb <<= 1
        self.num_buckets = nb
        self.max_kicks = max_kicks
        self.table = array("H", [0]) * (nb * 4)
        self.count = 0

    # fingerprint in [1, 0xFFFF] (0 = empty slot)
    @staticmethod
    def _fp_and_index(item_hash: int, num_buckets: int) -> tuple[int, int]:
        fp = (item_hash & 0xFFFF) or 1
        idx = (item_hash >> 16) & (num_buckets - 1)
        return fp, idx

    @staticmethod
    def _alt_index(idx: int, fp: int, num_buckets: int) -> int:
        # partial-key displacement: i2 = i1 XOR hash(fp)
        h = int.from_bytes(blake2b(fp.to_bytes(2, "little"),
                                   digest_size=4).digest(), "little")
        return (idx ^ h) & (num_buckets - 1)

    def _bucket_insert(self, idx: int, fp: int) -> bool:
        base = idx * 4
        t = self.table
        for s in range(4):
            if t[base + s] == _EMPTY:
                t[base + s] = fp
                return True
        return False

    def add(self, item_hash: int) -> bool:
        """Insert (idempotence not guaranteed — callers pair with exact set).
        Returns False when the filter is over-full (caller should resize or
        rely on the exact set)."""
        fp, i1 = self._fp_and_index(item_hash, self.num_buckets)
        i2 = self._alt_index(i1, fp, self.num_buckets)
        if self._bucket_insert(i1, fp) or self._bucket_insert(i2, fp):
            self.count += 1
            return True
        # displace
        idx = i1 if (item_hash & 1) else i2
        t = self.table
        for kick in range(self.max_kicks):
            slot = idx * 4 + ((item_hash + kick) & 3)
            fp, t[slot] = t[slot], fp
            idx = self._alt_index(idx, fp, self.num_buckets)
            if self._bucket_insert(idx, fp):
                self.count += 1
                return True
        return False

    def __contains__(self, item_hash: int) -> bool:
        fp, i1 = self._fp_and_index(item_hash, self.num_buckets)
        base1 = i1 * 4
        t = self.table
        if fp in t[base1:base1 + 4]:
            return True
        i2 = self._alt_index(i1, fp, self.num_buckets)
        base2 = i2 * 4
        return fp in t[base2:base2 + 4]

    # ----------------------------------------------------------- checkpoint
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, max_kicks: int = 500) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.table = array("H")
        cf.table.frombytes(data)
        cf.num_buckets = len(cf.table) // 4
        cf.max_kicks = max_kicks
        cf.count = sum(1 for v in cf.table if v != _EMPTY)
        return cf
