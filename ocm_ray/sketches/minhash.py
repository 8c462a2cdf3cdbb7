"""Bottom-k MinHash — mergeable set-similarity / cardinality sketch.

Behavioral contract from the vendored ``mh.h`` (SURVEY §2.3):
``RangeMinHash`` keeps the k smallest distinct hash values of the set
(``mh.h:121-130``); merge = k-smallest of the union; ``jaccard`` from the
shared bottom-k of the union (``mh.h:186,276``); cardinality estimated
from the k-th order statistic (``mh.h:106,335-361``).

Vectorized from scratch: ``np.partition`` over the union of the current
state and the new batch's unique hashes."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ocm_ray.core.hashing import wanghash
from ocm_ray.sketches.base import MergeableSketch, register_sketch

U64 = np.uint64


@register_sketch
class BottomKMinHash(MergeableSketch):
    kind = "bottomk"

    def __init__(self, k: int = 1024, seedseed: int = 137, prehashed: bool = False):
        self.k = int(k)
        self.seedseed = int(seedseed)
        self.prehashed = bool(prehashed)
        self.values = np.empty(0, dtype=U64)  # sorted ascending, ≤ k distinct hashes

    def update(self, items: np.ndarray, counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        h = items if self.prehashed else wanghash(items ^ U64(self.seedseed))
        cand = np.unique(h)  # sorted distinct
        if cand.size > self.k:
            cand = cand[: self.k]
        self.values = np.unique(np.concatenate([self.values, cand]))[: self.k]

    def merge(self, other: "BottomKMinHash") -> "BottomKMinHash":
        assert (self.k, self.seedseed, self.prehashed) == \
            (other.k, other.seedseed, other.prehashed), "geometry mismatch"
        self.values = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        return self

    # ---- estimators --------------------------------------------------------
    def cardinality_estimate(self) -> float:
        """(k−1) scaled by the k-th smallest hash (uniform order statistic)."""
        n = len(self.values)
        if n < self.k:
            return float(n)  # saw fewer than k distinct values — exact
        kth = float(self.values[self.k - 1]) + 1.0
        return (self.k - 1) * (2.0**64) / kth

    def jaccard(self, other: "BottomKMinHash") -> float:
        """|bottom-k(A∪B) ∩ A ∩ B| / k (the standard bottom-k estimator)."""
        union = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        if union.size == 0:
            return 1.0
        inter = np.intersect1d(union, self.values, assume_unique=True)
        inter = np.intersect1d(inter, other.values, assume_unique=True)
        return len(inter) / len(union)

    def _params(self) -> Dict:
        return dict(k=self.k, seedseed=self.seedseed, prehashed=self.prehashed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"values": self.values}


@register_sketch
class CountingBottomKMinHash(MergeableSketch):
    """Weighted bottom-k MinHash — the vendored ``CountingRangeMinHash``
    contract (``mh.h:463-560``): the k smallest distinct hashes each
    carry an occurrence COUNT; ``histogram_intersection`` scans the
    aligned bottom-k of the union accumulating min/max counts
    (``mh.h:545-560``); cardinality from the k-th order statistic
    (``mh.h:509-511``).

    Engine deviation (documented, an improvement): the reference counts
    in-set occurrences only — a hash evicted and later re-inserted
    restarts at 1, making counts arrival-order-dependent. Here partials
    keep exact per-hash occurrence totals and merge by key-summed union
    + keep-k-smallest, so every hash in the FINAL bottom-k carries its
    exact corpus count under any partitioning (a global-bottom-k hash
    is in every partition's bottom-k wherever it occurs — proof in the
    partition-invariance test)."""

    kind = "cbottomk"

    def __init__(self, k: int = 1024, seedseed: int = 137,
                 prehashed: bool = False):
        self.k = int(k)
        self.seedseed = int(seedseed)
        self.prehashed = bool(prehashed)
        self.values = np.empty(0, dtype=U64)      # sorted ascending
        self.counts = np.empty(0, dtype=np.int64)  # aligned with values

    def _fold(self, h: np.ndarray, c: np.ndarray) -> None:
        from ocm_ray.sketches.base import merge_sorted_counts

        vals, tot = merge_sorted_counts(self.values, self.counts, h, c)
        self.values = vals[: self.k]
        self.counts = tot[: self.k].astype(np.int64)

    def update(self, items: np.ndarray,
               counts: Optional[np.ndarray] = None) -> None:
        items = np.asarray(items).astype(U64, copy=False)
        if items.size == 0:
            return
        h = items if self.prehashed else wanghash(items ^ U64(self.seedseed))
        if counts is None:
            uniq, c = np.unique(h, return_counts=True)
            self._fold(uniq, c.astype(np.int64))
        else:
            # merge_sorted_counts aggregates duplicate keys within either
            # input exactly (int64 segment sums) — no pre-dedup needed
            self._fold(h, np.asarray(counts, np.int64))

    def merge(self, other: "CountingBottomKMinHash") -> "CountingBottomKMinHash":
        assert (self.k, self.seedseed, self.prehashed) == \
            (other.k, other.seedseed, other.prehashed), "geometry mismatch"
        self._fold(other.values, other.counts)
        return self

    # ---- estimators --------------------------------------------------------
    def cardinality_estimate(self) -> float:
        n = len(self.values)
        if n < self.k:
            return float(n)
        kth = float(self.values[self.k - 1]) + 1.0
        return (self.k - 1) * (2.0**64) / kth

    def histogram_intersection(self, other: "CountingBottomKMinHash") -> float:
        """min/max count ratio over the aligned bottom-k of the union
        (the weighted-Jaccard estimator of ``mh.h:545-560``): shared
        hashes contribute (min, max), singles contribute (0, count);
        the scan stops after k union entries."""
        assert (self.k, self.seedseed) == (other.k, other.seedseed), \
            "geometry mismatch"
        union = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        if union.size == 0:
            return 1.0
        ca = self._counts_for(union)
        cb = other._counts_for(union)
        denom = np.maximum(ca, cb).sum()
        num = np.minimum(ca, cb).sum()
        return float(num) / float(denom) if denom else 1.0

    def _counts_for(self, hashes: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.values, hashes)
        idx = np.minimum(idx, max(len(self.values) - 1, 0))
        hit = (self.values[idx] == hashes) if len(self.values) else \
            np.zeros(len(hashes), bool)
        out = np.zeros(len(hashes), np.int64)
        out[hit] = self.counts[idx[hit]]
        return out

    def sum(self) -> int:
        return int(self.counts.sum())

    def sum_sq(self) -> int:
        return int((self.counts.astype(object) ** 2).sum())

    def _params(self) -> Dict:
        return dict(k=self.k, seedseed=self.seedseed, prehashed=self.prehashed)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {"values": self.values, "counts": self.counts}

    def _set_arrays(self, arrays: Dict[str, np.ndarray]) -> None:
        self.values = arrays["values"]
        self.counts = arrays["counts"]
