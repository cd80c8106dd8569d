"""Exact-seed reference index.

Replaces the external bwa index: the reference is held as one concatenated
int8 array (HBM-resident on TPU) plus a sorted k-mer table for exact seed
lookup.  Lookups are vectorized searchsorted calls over all read k-mers at
once — the structure maps directly to a device gather, no FM-index needed
at these reference scales (SURVEY.md §7 phase 3).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

# 2-bit encode; anything not ACGT -> 4 (ambiguous)
ENCODE = np.full(256, 4, dtype=np.uint8)
for i, c in enumerate(b"ACGT"):
    ENCODE[c] = i
    ENCODE[c + 32] = i


PREFIX_BITS = 24


@dataclass
class KmerIndex:
    k: int
    ref: np.ndarray            # uint8 codes, concatenated chromosomes
    chrom_names: List[str]
    chrom_starts: np.ndarray   # int64 [n_chrom+1] offsets into ref
    keys: np.ndarray           # uint64 sorted kmer hashes
    positions: np.ndarray      # int64 positions (concatenated coords), key-sorted
    prefix_tab: np.ndarray = None  # int64 [2^p+1] bucket starts into keys

    def __post_init__(self):
        if self.prefix_tab is None:
            self.prefix_tab = self.build_prefix_tab(self.keys, self.k)

    def _prefix_shift(self, k: int) -> int:
        # derived from the table's actual size so differently-sized
        # cached tables (older 2^24 fixed ones included) stay valid
        bits = max(int(len(self.prefix_tab) - 1).bit_length() - 1, 0)
        return max(0, 2 * k - bits)

    @classmethod
    def build_prefix_tab(cls, keys: np.ndarray, k: int) -> np.ndarray:
        """Bucket-start table over the top bits of the 2k-bit hash:
        prefix_tab[p] = first index in keys whose prefix >= p.  Bounds
        every key lookup to one bucket (~1-8 entries) instead of a
        27-level binary search over the full table.  Bucket count scales
        with the index (≈ one bucket per key, capped at 2^PREFIX_BITS)
        so a tiny reference doesn't pay a fixed 134 MB table."""
        bits = min(PREFIX_BITS, 2 * k,
                   max(int(len(keys)).bit_length(), 1))
        shift = max(0, 2 * k - bits)
        nb = 1 << bits
        prefixes = (np.arange(nb, dtype=np.uint64) << np.uint64(shift))
        tab = np.empty(nb + 1, np.int64)
        tab[:nb] = np.searchsorted(keys, prefixes, "left")
        tab[nb] = len(keys)
        return tab

    @classmethod
    def build(cls, seqs: Dict[str, np.ndarray], k: int = 19) -> "KmerIndex":
        names = list(seqs)
        starts = np.zeros(len(names) + 1, np.int64)
        parts = []
        for i, n in enumerate(names):
            codes = ENCODE[seqs[n]]
            parts.append(codes)
            starts[i + 1] = starts[i] + len(codes)
        ref = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
        keys, positions = cls._hash_all(ref, starts, k)
        order = np.argsort(keys, kind="stable")
        return cls(k, ref, names, starts, keys[order], positions[order])

    @staticmethod
    def _hash_all(ref, starts, k):
        n = len(ref)
        if n < k:
            return np.zeros(0, np.uint64), np.zeros(0, np.int64)
        # rolling 2-bit pack: kmer[i] = ref[i..i+k) as base-4 integer
        valid = ref < 4
        h = np.zeros(n - k + 1, np.uint64)
        ok = np.ones(n - k + 1, bool)
        for j in range(k):
            h = (h << np.uint64(2)) | ref[j:n - k + 1 + j].astype(np.uint64)
            ok &= valid[j:n - k + 1 + j]
        # exclude kmers crossing chromosome boundaries
        pos = np.arange(n - k + 1, dtype=np.int64)
        for s in starts[1:-1]:
            ok &= (pos + k <= s) | (pos >= s)
        return h[ok], pos[ok]

    def _bounded_search(self, q: np.ndarray, side: str,
                        lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        """Vectorized binary search of q within per-element [lo, hi)
        bounds (= np.searchsorted(keys, q, side) given correct bounds).
        Iteration count is log2 of the largest bucket, with each round one
        gather — cache-friendly on the big memmapped key table."""
        keys = self.keys
        lo = lo.astype(np.int64, copy=True)
        hi = hi.astype(np.int64, copy=True)
        cap = max(len(keys) - 1, 0)
        while True:
            active = lo < hi
            if not active.any():
                return lo
            mid = (lo + hi) >> 1
            kv = keys[np.minimum(mid, cap)]
            go_right = (kv < q) if side == "left" else (kv <= q)
            adv = active & go_right
            lo = np.where(adv, mid + 1, lo)
            hi = np.where(active & ~go_right, mid, hi)

    def lookup(self, kmers: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """For an array of kmer hashes, return (lo, hi) ranges into
        self.positions (vectorized)."""
        if len(kmers) == 0:
            z = np.zeros(0, np.int64)
            return z, z
        if self.prefix_tab is not None and len(self.keys):
            shift = self._prefix_shift(self.k)
            p = (np.asarray(kmers, np.uint64)
                 >> np.uint64(shift)).astype(np.int64)
            b_lo = self.prefix_tab[p]
            b_hi = self.prefix_tab[p + 1]
            lo = self._bounded_search(kmers, "left", b_lo, b_hi)
            hi = self._bounded_search(kmers, "right", lo, b_hi)
            return lo, hi
        lo = np.searchsorted(self.keys, kmers, "left")
        hi = np.searchsorted(self.keys, kmers, "right")
        return lo, hi

    def hash_read(self, codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """All k-mer hashes of an encoded read; returns (offsets, hashes)
        for offsets whose k-mer contains no ambiguous base."""
        n = len(codes)
        k = self.k
        if n < k:
            return np.zeros(0, np.int64), np.zeros(0, np.uint64)
        h = np.zeros(n - k + 1, np.uint64)
        ok = np.ones(n - k + 1, bool)
        valid = codes < 4
        for j in range(k):
            h = (h << np.uint64(2)) | codes[j:n - k + 1 + j].astype(np.uint64)
            ok &= valid[j:n - k + 1 + j]
        offs = np.nonzero(ok)[0].astype(np.int64)
        return offs, h[ok]

    def tid_of(self, pos: int) -> int:
        return int(np.searchsorted(self.chrom_starts, pos, "right")) - 1
