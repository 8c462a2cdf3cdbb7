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


_P61 = np.uint64((1 << 61) - 1)  # Mersenne prime 2^61 − 1


def _mod61(x: np.ndarray) -> np.ndarray:
    x = (x & _P61) + (x >> np.uint64(61))
    return np.where(x >= _P61, x - _P61, x)


def _mulmod61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a · x) mod (2^61−1), vectorized in uint64 via 32-bit splits
    (every partial product stays < 2^64; 2^61 ≡ 1 mod p folds shifts)."""
    a = np.asarray(a, dtype=np.uint64)
    x = np.asarray(x, dtype=np.uint64)
    a1, a0 = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)
    x1, x0 = x >> np.uint64(32), x & np.uint64(0xFFFFFFFF)
    with np.errstate(over="ignore"):
        hi = _mod61(a1 * x1)                       # × 2^64 ≡ × 8
        hi = _mod61(hi << np.uint64(3))
        mid = _mod61(_mod61(a1 * x0) + _mod61(a0 * x1))   # × 2^32
        mid = _mod61((mid >> np.uint64(29))
                     + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32)))
        lo = _mod61(a0 * x0)
    return _mod61(hi + mid + lo)


def _poly4_hash(vals: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """4-wise-independent polynomial hash over GF(2^61−1), Horner form —
    the public construction behind the vendored ``KWiseHasherSet<4>``
    (``hash.h:325-430``)."""
    x = _mod61(np.asarray(vals, dtype=np.uint64))
    h = np.full(len(x), coeffs[3], dtype=np.uint64)
    for c in (coeffs[2], coeffs[1], coeffs[0]):
        h = _mod61(_mulmod61(h, x) + np.uint64(c))
    return h


@register_sketch
class CountSketch4W(MergeableSketch):
    """4-wise CountSketch (``cs4wbase_t``, ``ccm.h:589-780``): per row a
    single 4-wise polynomial hash provides BOTH the cell index (low
    ``np`` bits) and the sign (bit ``np``) — the independence the
    unbiased second-moment estimators need. Median point estimate
    (negatives clipped to 0 per the class commentary), cell-wise
    sum/difference merges, inner-product and L2 estimators
    (``ccm.h:700-716,617-619``)."""

    kind = "countsketch4w"

    def __init__(self, np_bits: int = 20, nh: int = 7, seedseed: int = 137):
        self.np_bits = int(np_bits)
        self.nh = force_odd_nh(int(nh))
        self.seedseed = int(seedseed)
        self.size = self.nh << self.np_bits
        self.core = np.zeros(self.size, dtype=np.int64)
        self.n_items = np.zeros(1, dtype=np.int64)
        from ocm_ray.core.hashing import MT19937_64

        rng = MT19937_64(seedseed)
        self.coeffs = np.array([[rng() % int(_P61) for _ in range(4)]
                                for _ in range(self.nh)], dtype=np.uint64)

    def _pos_sign(self, items: np.ndarray):
        pos = np.empty((len(items), self.nh), dtype=np.int64)
        sign = np.empty((len(items), self.nh), dtype=np.int64)
        mask = np.uint64((1 << self.np_bits) - 1)
        for j in range(self.nh):
            hv = _poly4_hash(items, self.coeffs[j])
            pos[:, j] = (hv & mask).astype(np.int64) + (j << self.np_bits)
            sign[:, j] = np.where(
                (hv >> np.uint64(self.np_bits)) & np.uint64(1), 1, -1)
        return pos, sign

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        uniq, cnt = dedupe_counts(items, counts)
        self.n_items[0] += int(cnt.sum())
        pos, sign = self._pos_sign(uniq)
        np.add.at(self.core, pos.ravel(), (sign * cnt[:, None]).ravel())

    def subtract_items(self, items: np.ndarray,
                       counts: Optional[np.ndarray] = None) -> None:
        """Deletion support (``sub``/``subh``): CountSketch is a linear
        sketch, so removal is a negated update."""
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        uniq, cnt = dedupe_counts(items, counts)
        self.n_items[0] -= int(cnt.sum())
        pos, sign = self._pos_sign(uniq)
        np.add.at(self.core, pos.ravel(), (-sign * cnt[:, None]).ravel())

    def estimate(self, items: np.ndarray) -> np.ndarray:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return np.zeros(0, dtype=np.int64)
        pos, sign = self._pos_sign(items)
        med = np.median(sign * self.core[pos], axis=1)
        return np.maximum(med, 0).astype(np.int64)  # clip chance negatives

    def l2est(self) -> float:
        """Second-moment (L2 norm) estimate: median over rows of
        sqrt(Σ cell²) (``ccm.h:617-619`` ``sqrl2``)."""
        rows = self.core.reshape(self.nh, -1).astype(np.float64)
        return float(np.median(np.sqrt((rows * rows).sum(axis=1))))

    def dot_product(self, other: "CountSketch4W") -> float:
        """Inner-product estimate between two streams sketched with the
        same geometry: median over rows of the per-row cell dot
        (``ccm.h:700-716``)."""
        assert (self.np_bits, self.nh, self.seedseed) == \
               (other.np_bits, other.nh, other.seedseed), "geometry mismatch"
        a = self.core.reshape(self.nh, -1).astype(np.float64)
        b = other.core.reshape(self.nh, -1).astype(np.float64)
        return float(np.median((a * b).sum(axis=1)))

    def merge(self, other: "CountSketch4W") -> "CountSketch4W":
        assert (self.np_bits, self.nh, self.seedseed) == \
               (other.np_bits, other.nh, other.seedseed), "geometry mismatch"
        self.core += other.core
        self.n_items += other.n_items
        return self

    def subtract(self, other: "CountSketch4W") -> "CountSketch4W":
        """operator-= (``ccm.h:761-767``): sketch of the stream
        difference."""
        assert (self.np_bits, self.nh, self.seedseed) == \
               (other.np_bits, other.nh, other.seedseed), "geometry mismatch"
        self.core -= other.core
        self.n_items -= other.n_items
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
