"""Bloom filter — mergeable membership sketch.

Behavioral contract from the vendored ``bf.h`` (SURVEY §2.3): bit array of
``2^(p+6)`` bits stored in uint64 words (``bf.h:59-76``); per-hash seeds
drawn from ``std::mt19937_64(seedseed)`` (``bf.h:108-110``); **merge =
bitwise OR** (``bf.h:515``), intersect = AND (``bf.h:468``);
linear-counting cardinality estimate (``bf.h:81-84``); intersection /
union size estimators (``bf.h:219,246``).

Implementation is vectorized from scratch: ``nh`` independent WangHash
probes per item (one seed each — simpler and strictly more standard than
the reference's multi-index-per-word packing, which is an internal layout
optimization, not a semantic)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import MT19937_64, wanghash
from ocm_ray.sketches.base import MergeableSketch, register_sketch

U64 = np.uint64

# bits-per-byte lookup: popcount via one gather + sum (8x less transient
# allocation than np.unpackbits, which materializes a bit-per-BYTE array)
_POPCOUNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1
                                                         ).astype(np.int64)


def _probe_positions(items: np.ndarray, seeds: np.ndarray,
                     mask: np.uint64, nh: int) -> np.ndarray:
    """The shared seeded-WangHash probe kernel: (n, nh) slot/bit indexes.
    One definition for BloomFilter bits and CountingBloomFilter slots —
    a probe-distribution change can't silently miss a twin."""
    items = np.asarray(items).astype(U64, copy=False)
    out = np.empty((len(items), nh), dtype=np.int64)
    for j, s in enumerate(seeds):
        out[:, j] = (wanghash(items ^ U64(s)) & mask).astype(np.int64)
    return out


@register_sketch
class BloomFilter(MergeableSketch):
    kind = "bloom"

    def __init__(self, p: int = 20, nh: int = 7, seedseed: int = 137):
        self.p = int(p)          # log2 of the number of BITS
        self.nh = int(nh)
        self.seedseed = int(seedseed)
        self.nbits = 1 << self.p
        self.words = np.zeros(self.nbits >> 6, dtype=np.uint64)
        rng = MT19937_64(seedseed)
        self.seeds = np.array([rng() for _ in range(self.nh)], dtype=U64)

    def _bit_positions(self, items: np.ndarray) -> np.ndarray:
        return _probe_positions(items, self.seeds, U64(self.nbits - 1),
                                self.nh)

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items)
        if items.size == 0:
            return
        pos = self._bit_positions(np.unique(items))
        words = (pos >> 6).ravel()
        bits = np.left_shift(U64(1), (pos & 63).astype(U64)).ravel()
        np.bitwise_or.at(self.words, words, bits)

    def contains(self, items: np.ndarray) -> np.ndarray:
        items = np.asarray(items)
        if items.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._bit_positions(items)
        w = self.words[pos >> 6]
        b = np.left_shift(U64(1), (pos & 63).astype(U64))
        return ((w & b) != 0).all(axis=1)

    def test_and_add(self, items: np.ndarray) -> np.ndarray:
        """Test-and-insert in one pass (``bf.h:586``
        ``may_contain_and_addh``): returns the pre-insert membership mask
        while inserting every item — the natural streaming-dedup
        primitive (True = seen before / probable duplicate). Batched
        semantics: repeats WITHIN the batch are resolved sequentially
        (the first occurrence reports False, later ones True), matching
        the per-item reference loop."""
        items = np.asarray(items)
        if items.size == 0:
            return np.zeros(0, dtype=bool)
        uniq, inverse = np.unique(items, return_inverse=True)
        # first occurrence index of each unique item (min over positions)
        first_pos = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_pos, inverse, np.arange(len(items)))
        seen_before = self.contains(uniq)
        self.update(uniq)
        out = np.ones(len(items), dtype=bool)  # non-first repeats → True
        out[first_pos] = seen_before
        return out

    # ---- estimators --------------------------------------------------------
    def popcount(self) -> int:
        return int(_POPCOUNT8[self.words.view(np.uint8)].sum())

    def cardinality_estimate(self) -> float:
        """Linear counting through the k-hash Bloom occupancy
        (Swamidass-Baldi): n ≈ -(m/k)·ln(1 − X/m)."""
        x = self.popcount()
        m, k = self.nbits, self.nh
        if x >= m:
            return float("inf")
        return -(m / k) * float(np.log1p(-x / m))

    def fpr(self) -> float:
        """Current false-positive probability from occupancy."""
        load = self.popcount() / self.nbits
        return float(load**self.nh)

    def union_size(self, other: "BloomFilter") -> float:
        u = self.empty_like()
        np.bitwise_or(self.words, other.words, out=u.words)
        return u.cardinality_estimate()

    def intersection_count(self, other: "BloomFilter") -> float:
        """Inclusion-exclusion through the linear-counting estimates
        (``bf.h:219,759-769`` shape)."""
        return max(0.0, self.cardinality_estimate() + other.cardinality_estimate()
                   - self.union_size(other))

    # ---- merge / io --------------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.p, self.nh, self.seedseed) == (other.p, other.nh, other.seedseed), \
            "geometry mismatch"
        self.words |= other.words
        return self

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.p, self.nh, self.seedseed) == (other.p, other.nh, other.seedseed)
        self.words &= other.words
        return self

    def _params(self) -> Dict:
        return dict(p=self.p, nh=self.nh, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"words": self.words}


@register_sketch
class CountingBloomFilter(MergeableSketch):
    """Counting Bloom filter — membership with deletion (the vendored
    ``cbf.h`` contract): per-slot counters instead of bits; insert = +1
    on each probe slot, delete = −1, contains = all slots > 0;
    **merge = cell-wise sum** (deletions compose across partitions).
    Slot layout / seeds identical to :class:`BloomFilter` with ``p`` as
    log2(slots)."""

    kind = "cbf"

    def __init__(self, p: int = 18, nh: int = 5, seedseed: int = 137):
        self.p = int(p)
        self.nh = int(nh)
        self.seedseed = int(seedseed)
        self.nslots = 1 << self.p
        # int64: the design corpus scale (countmin.py:33-35 — hot token
        # ~4e10 occurrences) overflows int32 slot counters, and merge()
        # sums partials on top of that
        self.counts = np.zeros(self.nslots, dtype=np.int64)
        rng = MT19937_64(seedseed)
        self.seeds = np.array([rng() for _ in range(self.nh)], dtype=U64)

    def _slots(self, items: np.ndarray) -> np.ndarray:
        return _probe_positions(items, self.seeds, U64(self.nslots - 1),
                                self.nh)

    def update(self, items: np.ndarray, counts=None) -> None:
        items = np.asarray(items)
        if items.size == 0:
            return
        from ocm_ray.sketches.base import dedupe_counts

        uniq, cnt = dedupe_counts(items, counts)
        pos = self._slots(uniq)
        np.add.at(self.counts, pos.ravel(), np.repeat(cnt, self.nh))

    def delete(self, items: np.ndarray, counts=None) -> None:
        """Remove previously-inserted items (caller guarantees they were
        inserted — the classic CBF contract; over-deletion would break
        the no-false-negative property for remaining items)."""
        items = np.asarray(items)
        if items.size == 0:
            return
        from ocm_ray.sketches.base import dedupe_counts

        uniq, cnt = dedupe_counts(items, counts)
        pos = self._slots(uniq)
        np.add.at(self.counts, pos.ravel(), -np.repeat(cnt, self.nh))

    def contains(self, items: np.ndarray) -> np.ndarray:
        items = np.asarray(items)
        if items.size == 0:
            return np.zeros(0, dtype=bool)
        return (self.counts[self._slots(items)] > 0).all(axis=1)

    def est_count(self, items: np.ndarray) -> np.ndarray:
        """CM-style one-sided count estimate: min over the item's slots
        (the ``cbf.est_count`` the filterhll gate reads)."""
        items = np.asarray(items)
        if items.size == 0:
            return np.zeros(0, dtype=np.int64)
        return self.counts[self._slots(items)].min(axis=1).astype(np.int64)

    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        assert (self.p, self.nh, self.seedseed) == \
               (other.p, other.nh, other.seedseed), "geometry mismatch"
        self.counts += other.counts
        return self

    def _params(self) -> Dict:
        return dict(p=self.p, nh=self.nh, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"counts": self.counts}


@register_sketch
class FilterHLL(MergeableSketch):
    """CBF-gated HLL (the vendored ``filterhll.h`` ``fhllbase_t``
    contract, ``filterhll.h:11-56``): every item feeds a counting Bloom
    filter; once its CBF estimate reaches ``threshold`` it also feeds an
    HLL — so ``estimate()`` approximates the number of DISTINCT items
    occurring at least ``threshold`` times (e.g. "how many tokens appear
    ≥ k times in the corpus" without exact counting).

    Batched semantics: updates arrive pre-aggregated (unique, count) per
    batch — the CBF absorbs the whole count, then the gate re-checks.
    Distributed caveat (inherent to the reference design, which defines
    no cross-sketch merge rule for the gate): an item whose occurrences
    split below-threshold across partitions is missed by every partial's
    gate, so the merged estimate is ONE-SIDED LOW w.r.t. a sequential
    pass; merge = CBF sum + HLL max."""

    kind = "filterhll"

    def __init__(self, p: int = 14, cbf_p: int = 20, cbf_nh: int = 4,
                 threshold: int = 2, seedseed: int = 137):
        self.p = int(p)
        self.cbf_p = int(cbf_p)
        self.cbf_nh = int(cbf_nh)
        self.threshold = int(threshold)
        self.seedseed = int(seedseed)
        from ocm_ray.sketches.hll import HyperLogLog

        self.cbf = CountingBloomFilter(cbf_p, cbf_nh, seedseed)
        self.hll = HyperLogLog(p, seedseed)

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items)
        if items.size == 0:
            return
        from ocm_ray.sketches.base import dedupe_counts

        uniq, cnt = dedupe_counts(items, counts)
        self.cbf.update(uniq, cnt)
        hot = self.cbf.est_count(uniq) >= self.threshold
        if hot.any():
            self.hll.update(np.asarray(uniq)[hot])

    def estimate(self) -> float:
        """≈ |{x : count(x) ≥ threshold}| (one-sided high from CBF
        collisions, one-sided low from cross-partition splits)."""
        return self.hll.estimate()

    def merge(self, other: "FilterHLL") -> "FilterHLL":
        assert (self.p, self.cbf_p, self.cbf_nh, self.threshold,
                self.seedseed) == (other.p, other.cbf_p, other.cbf_nh,
                                   other.threshold, other.seedseed), \
            "geometry mismatch"
        self.cbf.merge(other.cbf)
        self.hll.merge(other.hll)
        return self

    def _params(self) -> Dict:
        return dict(p=self.p, cbf_p=self.cbf_p, cbf_nh=self.cbf_nh,
                    threshold=self.threshold, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"cbf_counts": self.cbf.counts, "hll_registers": self.hll.registers}

    def _set_arrays(self, arrays: Dict[str, np.ndarray]) -> None:
        self.cbf.counts = arrays["cbf_counts"]
        self.hll.registers = arrays["hll_registers"]
