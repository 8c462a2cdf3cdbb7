"""CountSketch (signed count-min / AMS) and a space-saving top-k sketch.

CountSketch semantics per the vendored ``csbase_t`` (``ccm.h:412-539``,
SURVEY §2.3): same (nh × 2^np) geometry as CM; each update adds ±c where
the sign is a hash bit; the estimate is the MEDIAN of the signed row
reads — an *unbiased, two-sided* estimator (vs CM's one-sided
overestimate). Merge = cell-wise sum (``ccm.h:541-551``).

TopK approximates the vendored HeavyKeeper/``HeavyKeeperHeap``
(``hk.h:171-430``) behavioral contract — track the heavy hitters with
bounded memory — via the public Space-Saving/Misra-Gries algorithm
generalized to batch updates, which composes better with pre-aggregated
(unique, count) input than HK's per-item decay. Merge: combine counters,
keep top capacity (error bounds add, the standard mergeable-summary
result for Misra-Gries).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import derive_seeds, force_odd_nh, wanghash
from ocm_ray.sketches.base import MergeableSketch, dedupe_counts, register_sketch

U64 = np.uint64


@register_sketch
class CountSketch(MergeableSketch):
    kind = "countsketch"

    def __init__(self, np_bits: int = 20, nh: int = 7, seedseed: int = 137):
        self.np_bits = int(np_bits)
        self.nh = force_odd_nh(int(nh))  # odd rows → well-defined median
        self.seedseed = int(seedseed)
        self.seeds = derive_seeds(self.nh, self.seedseed)
        self.size = self.nh << self.np_bits
        self.core = np.zeros(self.size, dtype=np.int64)
        self.n_items = np.zeros(1, dtype=np.int64)

    def _pos_sign(self, items: np.ndarray):
        mask = U64((1 << self.np_bits) - 1)
        pos = np.empty((len(items), self.nh), dtype=np.int64)
        sign = np.empty((len(items), self.nh), dtype=np.int64)
        for j, s in enumerate(self.seeds):
            h = wanghash(items ^ U64(s))
            pos[:, j] = (h & mask).astype(np.int64) + (j << self.np_bits)
            # sign bit taken above the position bits — independent of pos
            sign[:, j] = (((h >> U64(self.np_bits)) & U64(1)).astype(np.int64) * 2) - 1
        return pos, sign

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        uniq, cnt = dedupe_counts(items, counts)
        self.n_items[0] += int(cnt.sum())
        pos, sign = self._pos_sign(uniq)
        w = sign * cnt[:, None]
        np.add.at(self.core, pos.ravel(), w.ravel())

    def estimate(self, items: np.ndarray) -> np.ndarray:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return np.zeros(0, dtype=np.int64)
        pos, sign = self._pos_sign(items)
        reads = sign * self.core[pos]
        return np.median(reads, axis=1).astype(np.int64)

    def merge(self, other: "CountSketch") -> "CountSketch":
        assert (self.np_bits, self.nh, self.seedseed) == \
               (other.np_bits, other.nh, other.seedseed), "geometry mismatch"
        self.core += other.core
        self.n_items += other.n_items
        return self

    def _params(self) -> Dict:
        return dict(np_bits=self.np_bits, nh=self.nh, seedseed=self.seedseed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"core": self.core, "n_items": self.n_items}


@register_sketch
class TopK(MergeableSketch):
    """Mergeable heavy-hitters summary (Misra-Gries / Space-Saving shape).

    Batched Misra-Gries: fold the pre-aggregated (unique, count) table
    into the counter table; when over capacity, subtract the
    (capacity+1)-th largest count from everyone and drop non-positives
    (one batched decrement round). Standard guarantees: stored counts
    UNDERestimate truth by at most ``err`` (the accumulated decrements,
    ≤ N/capacity), so ``count ≤ true ≤ count + err``; any item with
    true count > err is guaranteed present; merge = fold tables + add
    errors (the classic mergeable-summaries result).
    """

    kind = "topk"

    def __init__(self, capacity: int = 1024):
        self.capacity = int(capacity)
        self.keys = np.empty(0, dtype=U64)
        self.counts = np.empty(0, dtype=np.int64)
        self.err = np.zeros(1, dtype=np.int64)   # max undercount of evicted mass
        self.n_items = np.zeros(1, dtype=np.int64)

    def _fold(self, keys: np.ndarray, counts: np.ndarray) -> None:
        from ocm_ray.sketches.base import merge_sorted_counts

        if len(self.keys):
            k, c = merge_sorted_counts(self.keys, self.counts, keys, counts)
        else:
            order = np.argsort(keys, kind="stable")
            k, c = keys[order], counts[order]
        if len(k) > self.capacity:
            # batched MG decrement: subtract the (capacity+1)-th largest
            # count, drop the non-positive remainder
            d = int(np.partition(c, -(self.capacity + 1))[-(self.capacity + 1)])
            c = c - d
            keep = c > 0
            k, c = k[keep], c[keep]
            self.err[0] += d
        self.keys, self.counts = k, c

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        uniq, cnt = dedupe_counts(items, counts)
        self.n_items[0] += int(cnt.sum())
        self._fold(uniq, cnt)

    def top(self, k: Optional[int] = None):
        """(keys, counts) sorted by count desc, key asc — counts are
        underestimates; ``count + err`` upper-bounds the truth."""
        order = np.lexsort((self.keys, -self.counts))
        if k is not None:
            order = order[:k]
        return self.keys[order], self.counts[order]

    def merge(self, other: "TopK") -> "TopK":
        assert self.capacity == other.capacity, "geometry mismatch"
        if len(other.keys):
            self._fold(other.keys, other.counts)
        self.err[0] = int(self.err[0]) + int(other.err[0])
        self.n_items += other.n_items
        return self

    def _params(self) -> Dict:
        return dict(capacity=self.capacity)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"keys": self.keys, "counts": self.counts, "err": self.err,
                "n_items": self.n_items}
